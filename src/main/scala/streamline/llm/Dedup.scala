package streamline.llm

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import streamline.{Q, Tables}

/** §2.11 [C] deduplication operators: exact (hash-groupBy), MinHash+LSH
  * near-dup (shingle → minhash → band → bucket join), and SimHash.
  *
  * Scale posture: exact dedup is one hash shuffle on the digest; MinHash
  * LSH banding turns the quadratic all-pairs problem into a bucket join
  * (only same-bucket candidates are compared) — the standard 100 TB
  * path; SimHash is a per-row projection whose near-pair search would
  * band on hash prefixes. No driver-side loops anywhere.
  */
object Dedup {

  /** q_llm_dedup_exact — exact text dedup: sha256 digest, keep the
    * lowest doc_id per digest (deterministic survivor rule). */
  private def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"h").orderBy($"doc_id".asc)
    Tables.documents(spark, dir)
      .select($"doc_id", sha2($"text", 256).as("h"))
      .withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"doc_id", $"h")
      .orderBy($"doc_id")
  }

  private val dedupExactSql = """
    WITH d AS (SELECT doc_id, sha256(text) AS h,
      row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id ASC)
        AS rn
      FROM documents)
    SELECT doc_id, h FROM d WHERE rn = 1 ORDER BY doc_id"""

  /** Word 3-shingles. Unigram token SETS are degenerate on a small
    * vocabulary (the corpus has ~31 distinct words, so every pair of
    * docs shares most tokens and LSH banding collapses to an all-pairs
    * join); shingles restore set diversity — the standard
    * shingle→minhash→band pipeline. */
  private def shingles3(text: org.apache.spark.sql.Column) = {
    val w = split(text, " ")
    transform(sequence(lit(1), size(w) - 2),
      i => concat_ws(" ", element_at(w, i), element_at(w, i + 1),
        element_at(w, i + 2)))
  }

  /** q_llm_dedup_near — MinHash+LSH near-dup pairs over 3-shingle sets
    * (spark.ml MinHashLSH, fixed seed). Only same-bucket candidates are
    * compared — at 100 TB the bucket join is the whole point.
    * Approximate ⇒ no SQL oracle; planted-duplicate behavior is
    * unit-tested instead. */
  private def dedupNear(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", shingles3($"text").as("tokens"))
    val tf = new HashingTF().setInputCol("tokens").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feat = tf.transform(docs)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("mh")
      .setNumHashTables(5).setSeed(42L)
    val model = lsh.fit(feat)
    model.approxSimilarityJoin(feat, feat, 0.6, "jaccard_dist")
      .select(col("datasetA.doc_id").as("id_a"),
        col("datasetB.doc_id").as("id_b"),
        round(col("jaccard_dist"), 6).as("jaccard_dist"))
      .where($"id_a" < $"id_b")
      .orderBy($"id_a", $"id_b")
  }

  /** q_llm_simhash — 64-bit SimHash per document (deterministic MurmurHash3
    * word hashes, bitwise majority vote). Per-partition imperative logic →
    * typed mapPartitions; near-pair search at scale would band on 16-bit
    * prefixes. No SQL oracle (hash function is engine-specific); identity/
    * near-dup properties are unit-tested. */
  private def simhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, Simhash.simhash64(text.split(' ')))
      })
      .toDF("doc_id", "simhash")
      .orderBy($"doc_id")
  }

  val all: Seq[Q] = Seq(
    Q("q_llm_dedup_exact", dedupExact _, dedupExactSql),
    Q.noOracle("q_llm_dedup_near", dedupNear _),
    Q.noOracle("q_llm_simhash", simhash _))
}

object Simhash {
  /** Deterministic 64-bit word hash: two seeded 32-bit MurmurHash3
    * halves. Stable across JVMs and runs. */
  def hash64(w: String): Long = {
    val hi = scala.util.hashing.MurmurHash3.stringHash(w, 0x9747b28c)
    val lo = scala.util.hashing.MurmurHash3.stringHash(w, 0x85ebca6b)
    (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
  }

  def simhash64(words: Iterable[String]): Long = {
    val votes = new Array[Int](64)
    words.foreach { w =>
      val h = hash64(w)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
