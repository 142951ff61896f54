package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_llm_dedup_incremental against an in-JVM brute force that
  * scores EVERY delta × base pair directly (no candidate generation) —
  * so an incomplete keyed-join candidate set (a missed shared-gram
  * pair) or a wrong τ-verify cannot hide. Shingles here are raw
  * strings; the query hashes them to 64-bit (same no-collision
  * argument as q_llm_dedup_jaccard).
  */
class DedupIncrementalSpec extends SparkSuite {

  private def grams(text: String): Set[String] = {
    val w = text.split(" ")
    (0 until math.max(0, w.length - 2))
      .map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
  }

  test("verdicts match an all-pairs brute force over sf0.001") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val base = docs.filter(_._1 % 5 != 0)
    val delta = docs.filter(_._1 % 5 == 0)
    val baseByText = base.groupBy(_._2)
    val expected = delta.map { case (id, text) =>
      val exact = baseByText.get(text).map(_.map(_._1).min)
      val g = grams(text)
      val near = base.flatMap { case (bid, btext) =>
        val bg = grams(btext)
        val i = (g & bg).size
        if (3 * i >= g.size + bg.size)
          Some((bid,
            BigDecimal(math.round(i.toDouble / (g.size + bg.size - i) * 1e6))
              / 1e6))
        else None
      }.sortBy { case (bid, jac) => (-jac, bid) }.headOption
      exact match {
        case Some(b) => (id, "dropped_exact", b, BigDecimal(1.0))
        case None => near match {
          case Some((b, j)) => (id, "dropped_near", b, j)
          case None         => (id, "kept", -1L, BigDecimal(0.0))
        }
      }
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_llm_dedup_incremental")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        BigDecimal(r.getDouble(3))))
    assert(got.toSeq === expected.toSeq)
    // the cascade must discriminate on this corpus
    assert(got.map(_._2).distinct.length > 1)
  }

  test("streaming ingest equals batch, invariant to file batching") {
    import org.apache.spark.sql.functions.col
    val batch = SparkEntry.queries("q_llm_dedup_incremental")(spark, sfDir)
      .collect().toSeq
    // default 2-shard staging (the declared query; r18 shave)
    val stream2 = SparkEntry.queries("q_stream_dedup_incremental")(
      spark, sfDir).collect().toSeq
    assert(stream2 === batch, "2-shard streaming drain != batch witness")
    // a DIFFERENT sharding of the same delta must not change verdicts:
    // 7 shards (uneven, some possibly empty) through the same drain
    val tmp = java.nio.file.Files.createTempDirectory("dedupinc_spec")
    try {
      val root = s"$tmp/in"
      Tables.documents(spark, sfDir).where(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("text")).repartition(7)
        .write.parquet(root)
      val base = llm.Dedup.incShingled(Tables.documents(spark, sfDir))
        .where(col("doc_id") % 5 =!= 0).localCheckpoint(true)
      val stream7 = llm.Dedup.streamIncrementalDrain(spark, root, base)
        .orderBy(col("doc_id")).collect().toSeq
      assert(stream7 === batch, "7-shard streaming drain != batch witness")
    } finally stream.Streams.deleteRec(tmp.toFile)
  }
}
