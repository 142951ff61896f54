package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_llm_coverage against an INDEPENDENT in-JVM brute force —
  * literal per-doc shingle Sets over the collected sf0.001 documents —
  * so a benchmark doc leaking into its own corpus side, an undeduped
  * hit count, or a lost zero-coverage doc cannot cancel out. */
class CoverageSpec extends SparkSuite {

  private def r6(num: BigInt, den: BigInt): Double =
    ((BigInt(2000000) * num + den) / (2 * den)).toDouble / 1000000.0

  test("per-benchmark-doc coverage matches literal shingle sets") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def sh(text: String): Set[String] =
      text.split(" ", -1).toSeq.sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    val corpus = docs.filter(_._1 % 50 != 0).flatMap(d => sh(d._2)).toSet
    val expected = docs.filter(_._1 % 50 == 0).map { case (id, text) =>
      val grams = sh(text)
      val cov = grams.count(corpus)
      (id, grams.size.toLong, cov.toLong,
        r6(BigInt(cov), BigInt(grams.size)))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_llm_coverage")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === expected)
    // non-degenerate: coverage varies and is neither all-0 nor all-1
    assert(got.map(_._4).distinct.size > 2)
    assert(got.exists(_._4 < 1.0) && got.exists(_._4 > 0.5))
  }
}
