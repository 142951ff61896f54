package streamline

import graft.SparkSuite
import streamline.batch.Cep
import streamline.batch.Cep.{CepEv, CepMatch}

/** Boundary semantics of the Kleene-plus NFA (SURVEY.md §2.15):
  * run growth, reset on foreign events, the within bound measured from
  * the FIRST element, and greedy non-overlap after a match. */
class CepKleeneSpec extends SparkSuite {

  import graft.SparkTestBase.spark.implicits._

  private val MIN = 60L * 1000 * 1000 // one minute in µs
  private def ev(u: Long, id: Long, t: String, m: Long) =
    CepEv(u, id, t, m * MIN)

  private def run(evs: Seq[CepEv]): Seq[CepMatch] =
    Cep.kleeneMatches(evs.toDS(), "click", "purchase", 10 * MIN)
      .collect().toSeq.sortBy(m => (m.user_id, m.purchase_id))

  test("a run of clicks then a purchase matches with the full run length") {
    val m = run(Seq(ev(1, 1, "click", 0), ev(1, 2, "click", 1),
      ev(1, 3, "click", 2), ev(1, 4, "purchase", 3)))
    assert(m == Seq(CepMatch(1, 3, 1, 4, 0, 3 * MIN)))
  }

  test("a foreign event breaks the run (relaxed length, strict contiguity)") {
    val m = run(Seq(ev(1, 1, "click", 0), ev(1, 2, "view", 1),
      ev(1, 3, "click", 2), ev(1, 4, "purchase", 3)))
    // only the second click belongs to the matched run
    assert(m == Seq(CepMatch(1, 1, 3, 4, 2 * MIN, 3 * MIN)))
  }

  test("within is measured from the first click of the run, inclusive") {
    // first click at 0, purchase at exactly 10 min → match
    val hit = run(Seq(ev(1, 1, "click", 0), ev(1, 2, "click", 9),
      ev(1, 3, "purchase", 10)))
    assert(hit.map(_.purchase_id) == Seq(3))
    // purchase at 11 min: the LAST click is 2 min before, but the run
    // started 11 min before → no match
    val miss = run(Seq(ev(2, 1, "click", 0), ev(2, 2, "click", 9),
      ev(2, 3, "purchase", 11)))
    assert(miss.isEmpty)
  }

  test("matches do not overlap: a second purchase needs a fresh run") {
    val m = run(Seq(ev(1, 1, "click", 0), ev(1, 2, "purchase", 1),
      ev(1, 3, "purchase", 2)))
    assert(m == Seq(CepMatch(1, 1, 1, 2, 0, 1 * MIN)))
  }

  test("runs never leak across users") {
    val m = run(Seq(ev(1, 1, "click", 0), ev(2, 2, "purchase", 1)))
    assert(m.isEmpty)
  }
}
