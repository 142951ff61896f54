package streamline

import graft.SparkSuite
import org.apache.spark.sql.streaming.TestGroupState
import streamline.stream.Connect
import streamline.stream.Connect.{CsRow, CsRule}

/** Broadcast-state bound of the connected-streams operator (SURVEY.md
  * §2.16): after any batch the per-key state holds exactly the latest
  * rule — never a rule history — and data rows are matched against the
  * rule in effect at their event time. */
class RuleStateBoundSpec extends SparkSuite {

  private def freshState: TestGroupState[List[CsRule]] =
    TestGroupState.create[List[CsRule]](
      optionalState = org.apache.spark.api.java.Optional.empty(),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
      hasTimedOut = false)

  private def ctrl(id: Long, tsUs: Long, thr: Double) =
    CsRow(1L, tsUs, id, is_ctrl = true, thr)
  private def data(id: Long, tsUs: Long, v: Double) =
    CsRow(1L, tsUs, id, is_ctrl = false, v)

  test("state retains exactly the latest rule after a multi-rule batch") {
    val state = freshState
    Connect.updateConnect(1L,
      Iterator(ctrl(1, 100, 5.0), ctrl(2, 200, 7.0), ctrl(3, 150, 6.0)),
      state).toList
    assert(state.get == List(CsRule(200, 2, 7.0)))
  }

  test("rules apply by event time, not batch arrival order") {
    val state = freshState
    // data at t=120 must see the t=100 rule (thr 5) even though the
    // t=200 rule arrives in the same batch.
    val out = Connect.updateConnect(1L,
      Iterator(ctrl(1, 100, 5.0), ctrl(2, 200, 50.0), data(10, 120, 9.0)),
      state).toList
    assert(out.map(o => (o.event_id, o.rule_id, o.threshold)) ==
      List((10L, 1L, 5.0)))
  }

  test("data before any rule, or at/below threshold, emits nothing") {
    val state = freshState
    val out = Connect.updateConnect(1L,
      Iterator(data(10, 50, 99.0), // before the first rule
        ctrl(1, 100, 5.0),
        data(11, 110, 5.0), // == threshold: not an alert
        data(12, 120, 4.0)), // below
      state).toList
    assert(out.isEmpty)
  }

  test("the retained rule carries across batches") {
    val state = freshState
    Connect.updateConnect(1L, Iterator(ctrl(1, 100, 5.0)), state).toList
    val out = Connect.updateConnect(1L, Iterator(data(10, 500, 6.0)), state).toList
    assert(out.map(_.rule_id) == List(1L))
    assert(state.get == List(CsRule(100, 1, 5.0)))
  }
}
