package streamline

import graft.SparkSuite
import streamline.llm.Simhash

/** Bit-pins the two DETERMINISTIC no-oracle rows (q_llm_simhash,
  * q_llm_simhash_pairs) by full in-JVM recomputation at sf0.001: the
  * signature function is pure MurmurHash3 — nothing approximate — so
  * the entire output table can be recomputed independently of the
  * distributed plan and compared for exact equality. This upgrades
  * both rows from property-tested (planted pairs) to bit-pinned,
  * leaving only the genuinely approximate sketches/ANN paths outside
  * the oracle perimeter (round-10 verdict, next-round item 4). */
class SimhashParitySpec extends SparkSuite {

  val sparkI = graft.SparkTestBase.spark
  import sparkI.implicits._

  // the same word split the query uses; recomputed driver-side
  private lazy val sigs: Map[Long, Long] =
    Tables.documents(spark, sfDir).select($"doc_id", $"text")
      .as[(Long, String)].collect()
      .map { case (id, text) => id -> Simhash.simhash64(text.split(' ')) }
      .toMap

  test("q_llm_simhash equals an in-JVM recomputation, row for row") {
    val got = graft.SparkEntry.queries("q_llm_simhash")(spark, sfDir)
      .as[(Long, Long)].collect().toSeq
    assert(got.size == sigs.size)
    // ordered by doc_id AND bit-identical signatures
    assert(got.map(_._1) == got.map(_._1).sorted)
    got.foreach { case (id, sig) => assert(sigs(id) == sig, s"doc $id") }
  }

  test("q_llm_simhash_pairs equals brute-force all-pairs hamming <= 3") {
    val ids = sigs.keys.toSeq.sorted
    val expect = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.size
      a = ids(i); b = ids(j)
      h = Simhash.hamming(sigs(a), sigs(b)) if h <= 3
    } yield (a, b, h)).toSeq.sorted
    val got = graft.SparkEntry.queries("q_llm_simhash_pairs")(spark, sfDir)
      .as[(Long, Long, Int)].collect().toSeq
    // the banded plan is a COMPLETE candidate generator for d <= 3
    // (pigeonhole over four 16-bit bands) — so not just recall but
    // exact set equality against the quadratic reference
    assert(got.sorted == expect, s"got ${got.size}, expect ${expect.size}")
    assert(got.map(p => (p._1, p._2)) == got.map(p => (p._1, p._2)).sorted)
  }
}
