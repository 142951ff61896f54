package streamline

import graft.SparkSuite
import streamline.batch.SkewJoin

/** Pins the q_join_aqe_demote witness: the static plan must be a
  * sort-merge join (the filter's compile-time size estimate is the
  * full file) and the FINAL adaptive plan must be a broadcast join
  * (runtime shuffle stats reveal the tiny side) — a green correctness
  * row alone would also pass with AQE silently not firing. */
class AqeDemoteSpec extends SparkSuite {

  test("DynamicJoinSelection demotes the sort-merge join to broadcast " +
       "at runtime") {
    SkewJoin.withConfs(spark, SkewJoin.demoteConfs) {
      val df = SkewJoin.demoteJoinStage(spark, sfDir)
      // before execution: the adaptive plan wraps the STATIC choice
      val initial = df.queryExecution.executedPlan.toString
      assert(initial.contains("SortMergeJoin"),
        s"static plan should be a sort-merge join:\n$initial")
      df.collect() // materialize: AQE finalizes the adaptive plan
      // AdaptiveSparkPlan.toString prints the final plan followed by
      // the initial one (which legitimately still says SortMergeJoin)
      // — assert on the final section only.
      val whole = df.queryExecution.executedPlan.toString
      assert(whole.contains("isFinalPlan=true"), whole.take(300))
      val fin = whole.split("== Initial Plan ==").head
      assert(fin.contains("BroadcastHashJoin"),
        s"runtime demotion to broadcast did not happen:\n$fin")
      assert(!fin.contains("SortMergeJoin"),
        s"sort-merge join survived in the final plan:\n$fin")
    }
  }
}
