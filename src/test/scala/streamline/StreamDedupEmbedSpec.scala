package streamline

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions.col

/** Pins q_stream_dedup_embed beyond its DuckDB oracle:
  *  1. an in-JVM brute force re-derives every verdict by literally
  *     banding and probing each delta vector against all base vectors
  *     (no Spark joins) — a wrong bucket key, an incomplete candidate
  *     join, or a mis-keyed best-match window cannot hide;
  *  2. the drain must be INVARIANT to file batching — a different
  *     shard count over the same delta yields identical verdicts
  *     (per-vector independence is the property that makes the
  *     appended union equal the batch split). */
class StreamDedupEmbedSpec extends SparkSuite {

  private def bands(emb: Array[Float]): Seq[(Int, Int)] =
    (0 until 8).map { b =>
      val bkt = (0 until 4).map(i =>
        if (emb(b * 4 + i) > 0f) 1 << i else 0).sum
      (b, bkt)
    }

  private def cos6(a: Array[Float], b: Array[Float]): BigDecimal = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    BigDecimal(math.round(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6)) / 1e6
  }

  private def vecs() = Tables.embeddings(spark, sfDir)
    .select("vec_id", "embedding").collect()
    .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  test("verdicts match a literal band-and-probe brute force") {
    val all = vecs()
    val base = all.filter(_._1 % 5 != 0)
    val delta = all.filter(_._1 % 5 == 0)
    val expected = delta.map { case (vid, e) =>
      val myBands = bands(e).toSet
      val best = base.iterator
        .filter { case (_, be) => bands(be).exists(myBands) }
        .map { case (bid, be) => (bid, cos6(e, be)) }
        .filter(_._2 >= BigDecimal("0.35"))
        .toSeq.sortBy { case (bid, c) => (-c, bid) }.headOption
      best match {
        case Some((bid, c)) => (vid, "dropped", bid, c)
        case None           => (vid, "kept", -1L, BigDecimal(0.0))
      }
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_stream_dedup_embed")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        BigDecimal(r.getDouble(3))))
    assert(got.toSeq === expected.toSeq)
    // the probe must discriminate on this corpus
    assert(got.map(_._2).distinct.length > 1,
      "fixture yields only one verdict — probe untested")
  }

  test("drain is invariant to file batching (7 shards == 4 shards)") {
    val declared = SparkEntry.queries("q_stream_dedup_embed")(spark, sfDir)
      .collect().toSeq
    val tmp = java.nio.file.Files.createTempDirectory("dedupembs_spec")
    try {
      val stage = s"$tmp/in"
      Tables.embeddings(spark, sfDir).where(col("vec_id") % 5 === 0)
        .select(col("vec_id"), col("embedding")).repartition(7)
        .write.parquet(stage)
      val baseIdx = llm.Similarity.signBanded(spark,
        Tables.embeddings(spark, sfDir).where(col("vec_id") % 5 =!= 0))
        .localCheckpoint(true)
      val stream7 = llm.Similarity.streamEmbedDrain(spark, stage, baseIdx)
        .orderBy(col("vec_id")).collect().toSeq
      assert(stream7 === declared, "7-shard drain != declared 4-shard run")
    } finally stream.Streams.deleteRec(tmp.toFile)
  }
}
