package streamline

import org.scalatest.funsuite.AnyFunSuite
import streamline.stream.Stateful
import streamline.stream.Stateful.FnRow

/** q_stream_funnel's state transition: the final funnel step must be
  * invariant under how the user's events are partitioned into batches
  * and in what order they arrive (a late EARLIER signup legitimately
  * shifts or revokes later steps — the candidate-set state makes the
  * final answer a pure function of the event SET). Also pins the chain
  * semantics against a direct reference computation. */
class StatefulFunnelSpec extends AnyFunSuite {

  private val day = 86400000000L

  /** Reference: the batch SQL semantics, computed directly. */
  private def referenceStep(events: Seq[FnRow]): Long = {
    def minAfter(prevT: Long, typ: String): Long = {
      val elig = events.filter(e => e.event_type == typ &&
        e.ts > prevT && e.ts <= prevT + day).map(_.ts)
      if (elig.isEmpty) Long.MinValue else elig.min
    }
    val signups = events.filter(_.event_type == "signup").map(_.ts)
    val t1 = if (signups.isEmpty) Long.MinValue else signups.min
    val t2 = if (t1 == Long.MinValue) Long.MinValue else minAfter(t1, "view")
    val t3 = if (t2 == Long.MinValue) Long.MinValue else minAfter(t2, "click")
    val t4 = if (t3 == Long.MinValue) Long.MinValue
      else minAfter(t3, "purchase")
    Seq(t1, t2, t3, t4).takeWhile(_ != Long.MinValue).size.toLong
  }

  private def streamStep(batches: Seq[Seq[FnRow]]): Long = {
    var st = Stateful.funnelEmptyState
    var step = 0L
    batches.foreach { b =>
      val (next, s) = Stateful.funnelAdvance(st, b)
      st = next; step = s
    }
    step
  }

  test("late earlier signup revokes a completed chain") {
    val h = 3600000000L // 1h in us
    // signup@100h, view@110h, click@115h, purchase@120h → full funnel…
    val first = Seq(FnRow(1, 100 * h, "signup"), FnRow(1, 110 * h, "view"),
      FnRow(1, 115 * h, "click"), FnRow(1, 120 * h, "purchase"))
    val (st1, s1) = Stateful.funnelAdvance(Stateful.funnelEmptyState, first)
    assert(s1 == 4L)
    // …then a signup@10h arrives late: the 24 h window moves to
    // (10h, 34h], no view inside → the funnel collapses to step 1.
    val (_, s2) = Stateful.funnelAdvance(st1, Seq(FnRow(1, 10 * h, "signup")))
    assert(s2 == 1L)
  }

  test("final step is invariant under random batch splits and orders") {
    val rnd = new scala.util.Random(4242)
    val types = Array("signup", "view", "click", "purchase", "error")
    for (trial <- 1 to 50) {
      val events = Seq.fill(3 + rnd.nextInt(25))(
        FnRow(1, rnd.nextInt(200).toLong * 3600000000L,
          types(rnd.nextInt(types.length))))
      val expected = referenceStep(events)
      val shuffled = rnd.shuffle(events)
      // random partition into 1..6 batches
      val nb = 1 + rnd.nextInt(6)
      val batches = shuffled.zipWithIndex.groupBy(_._2 % nb).toSeq
        .sortBy(_._1).map(_._2.map(_._1))
      assert(streamStep(batches) == expected,
        s"trial $trial: $events split $nb")
    }
  }
}
