package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_llm_dedup_jaccard's two perf claims (llm/Dedup.scala):
  *
  *  1. The prefix-index self-join is a shuffle(-hash) join whose two
  *     identical exchanges collapse via ReuseExchange — the shingle /
  *     explode pipeline is computed once, not twice.
  *  2. No CartesianProduct anywhere (the candidate join is keyed).
  */
class JaccardPlanSpec extends SparkSuite {

  test("prefix self-join reuses one exchange; no cartesian") {
    val df = SparkEntry.queries("q_llm_dedup_jaccard")(spark, sfDir)
    df.collect() // materialize THIS dataset's own query execution:
    // under AQE, exchange/stage reuse only appears in the final plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") ||
        plan.contains("ReusedQueryStage"),
      s"expected the candidate self-join sides to collapse via " +
        s"exchange/stage reuse, got:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      "candidate generation must stay a keyed join")
  }
}
