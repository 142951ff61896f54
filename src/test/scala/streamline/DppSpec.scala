package streamline

import graft.SparkSuite
import streamline.batch.Joins

/** Pins the q_join_dpp witness: the fact scan's partition filter must
  * be a runtime DynamicPruningExpression (a green correctness row
  * alone would also pass with DPP silently not firing — the join
  * itself filters the same rows), and the result must be identical
  * with the rule disabled.
  */
class DppSpec extends SparkSuite {

  test("fact scan carries a dynamicpruning partition filter and the " +
       "result is pruning-invariant") {
    val df = Joins.dppStage(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no DynamicPruningExpression in the fact scan:\n$plan")
    val withDpp = df.collect().map(_.toString).sorted

    val key = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val off = Joins.dppStage(spark, sfDir)
      assert(!off.queryExecution.executedPlan.toString
        .contains("dynamicpruning"))
      assert(off.collect().map(_.toString).sorted.sameElements(withDpp),
        "result changed when dynamic partition pruning was disabled")
    } finally spark.conf.set(key, prev)
  }
}
