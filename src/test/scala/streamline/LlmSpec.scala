package streamline

import graft.SparkSuite
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._
import streamline.llm.Simhash

class SimhashSpec extends SparkSuite {

  test("identical texts get identical simhash") {
    val a = Simhash.simhash64("the quick brown fox".split(' '))
    val b = Simhash.simhash64("the quick brown fox".split(' '))
    assert(a == b)
  }

  test("near-duplicates are close in hamming, unrelated texts far") {
    val base = ("word" * 1).split(' ') // placeholder, replaced below
    val t1 = (1 to 60).map(i => s"tok$i")
    val t2 = t1.updated(5, "changed").updated(30, "other") // 2 word swap
    val t3 = (1 to 60).map(i => s"zzz$i")
    val h1 = Simhash.simhash64(t1)
    val h2 = Simhash.simhash64(t2)
    val h3 = Simhash.simhash64(t3)
    assert(Simhash.hamming(h1, h2) < Simhash.hamming(h1, h3))
    assert(Simhash.hamming(h1, h2) <= 16)
  }
}

class MinHashNearDupSpec extends SparkSuite {

  test("MinHashLSH finds a planted near-duplicate pair") {
    val sparkI = graft.SparkTestBase.spark
    import sparkI.implicits._
    val doc = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].head()
    // Plant: the original doc and a copy with one word changed.
    val near = doc._2.split(' ').updated(0, "PLANTED").mkString(" ")
    val df = Seq((900001L, doc._2), (900002L, near)).toDF("doc_id", "text")
      .select($"doc_id", split($"text", " ").as("tokens"))
    val tf = new HashingTF().setInputCol("tokens").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feat = tf.transform(df)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("mh")
      .setNumHashTables(8).setSeed(42L)
    val pairs = lsh.fit(feat)
      .approxSimilarityJoin(feat, feat, 0.6, "jaccard_dist")
      .select(col("datasetA.doc_id"), col("datasetB.doc_id"))
      .where(col("datasetA.doc_id") === 900001L &&
        col("datasetB.doc_id") === 900002L)
    assert(pairs.count() == 1)
  }
}

class WeightedAvgSpec extends SparkSuite {
  import streamline.agg.{WBuf, WeightedAvg}

  test("merge order cannot change the result") {
    val xs = Seq((10.0, 2.0), (20.5, 1.0), (0.3333, 5.0), (99.99, 0.5))
    val seq1 = xs.foldLeft(WeightedAvg.zero)(WeightedAvg.reduce)
    val (l, r) = xs.splitAt(2)
    val par = WeightedAvg.merge(
      r.foldLeft(WeightedAvg.zero)(WeightedAvg.reduce),
      l.foldLeft(WeightedAvg.zero)(WeightedAvg.reduce))
    assert(WeightedAvg.finish(seq1) == WeightedAvg.finish(par))
  }

  test("matches the decimal-sum formula") {
    val b = WeightedAvg.reduce(WeightedAvg.reduce(WeightedAvg.zero,
      (10.0, 2.0)), (20.0, 2.0))
    assert(WeightedAvg.finish(b) == 15.0)
  }
}

class CosineExprSpec extends SparkSuite {

  test("CosineSim matches a reference implementation (eval + codegen)") {
    val sparkI = graft.SparkTestBase.spark
    import sparkI.implicits._
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-1.0f, 0.5f, 2.0f)
    def ref(x: Array[Float], y: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- x.indices) {
        dot += x(i).toDouble * y(i).toDouble
        nx += x(i).toDouble * x(i).toDouble
        ny += y(i).toDouble * y(i).toDouble
      }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    val got = Seq((a, b)).toDF("a", "b")
      .select(streamline.expr.Exprs.cosine(col("a"), col("b")))
      .as[Double].head()
    assert(got == ref(a, b))
    // identical vectors → 1.0 within ulps
    val self = Seq((a, a)).toDF("a", "b")
      .select(streamline.expr.Exprs.cosine(col("a"), col("b")))
      .as[Double].head()
    assert(math.abs(self - 1.0) < 1e-12)
  }
}

class MmResizeFixtureSpec extends SparkSuite {

  test("mm_resize fixture invariant: documents text is ASCII") {
    // q_llm_mm_resize strides the payload's BYTES; its DuckDB oracle
    // strides regex CHARS. The two coincide iff every char is one byte,
    // i.e. the fixture text is pure ASCII. Pin that assumption here so
    // a multi-byte fixture fails loudly instead of silently diverging.
    import org.apache.spark.sql.functions._
    val nonAscii = Tables.documents(spark, sfDir)
      .where(length(col("text")) =!= octet_length(col("text")))
      .count()
    assert(nonAscii == 0L,
      s"$nonAscii documents contain multi-byte chars; byte-stride and " +
        "char-stride resize would diverge")
  }
}

class QuantizeErrorSpec extends SparkSuite {

  test("int8 quantization reconstructs within half a scale step") {
    // the quality contract of q_llm_quantize: |x - q*scale| <= scale/2
    // per element (half-up rounding), and codes stay inside int8 range.
    // Uses the array-typed internal form (quantizeCodes) — the declared
    // query serializes q to CSV per SURVEY §2.12, so the list-shape
    // contract lives here.
    import org.apache.spark.sql.functions._
    val sparkI = graft.SparkTestBase.spark
    import sparkI.implicits._
    val rows = streamline.llm.Similarity.quantizeCodes(spark, sfDir)
      .join(Tables.embeddings(spark, sfDir), "vec_id")
      .select($"vec_id", $"scale", $"q", $"embedding")
      .as[(Long, Double, Array[Int], Array[Float])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, scale, q, x) =>
      assert(q.length == x.length, s"vec $id arity")
      if (scale == 0.0) assert(q.forall(_ == 0))
      else {
        assert(q.forall(c => c >= -127 && c <= 127), s"vec $id code range")
        q.zip(x).foreach { case (c, xi) =>
          val err = math.abs(xi.toDouble - c * scale)
          assert(err <= scale / 2 + 1e-12, s"vec $id err=$err scale=$scale")
        }
      }
    }
  }

  test("declared CSV serialization round-trips the code array") {
    // q_llm_quantize emits q_csv (string) for the driver comparator;
    // splitting it back must reproduce the internal array form exactly.
    import org.apache.spark.sql.functions._
    val declared = graft.SparkEntry.queries("q_llm_quantize")(spark, sfDir)
    val mismatches = declared
      .join(streamline.llm.Similarity.quantizeCodes(spark, sfDir)
        .select(col("vec_id"), col("q")), "vec_id")
      .where(split(col("q_csv"), ",").cast("array<int>") =!= col("q"))
      .count()
    assert(mismatches == 0L)
  }
}
