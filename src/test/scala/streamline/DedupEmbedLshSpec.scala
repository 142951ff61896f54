package streamline

import graft.{SparkEntry, SparkSuite}

/** q_llm_dedup_embed_lsh vs the exact baseline q_llm_dedup_embed:
  * the banded candidate set must never invent a pair (precision 1 —
  * every reported pair passes the same exact-cosine confirm), and the
  * OR-amplified coordinate-hyperplane bands must keep a usable share
  * of the true pairs on the fixture (recall floor; the analytic
  * estimate for 8 bands × 4 bits at cos≈0.35 is ~0.7). */
class DedupEmbedLshSpec extends SparkSuite {

  val sparkI = graft.SparkTestBase.spark
  import sparkI.implicits._

  test("LSH pairs are a subset of the exact pairs, with bounded recall loss") {
    val exact = SparkEntry.queries("q_llm_dedup_embed")(spark, sfDir)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    val lsh = SparkEntry.queries("q_llm_dedup_embed_lsh")(spark, sfDir)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    assert(lsh.nonEmpty)
    assert(lsh.subsetOf(exact),
      s"invented pairs: ${(lsh -- exact).take(5)}")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall (lsh=${lsh.size}, exact=${exact.size})")
  }
}
