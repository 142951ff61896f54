package streamline

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins q_join_null_safe (SURVEY.md §2.3): `<=>` must stay an EQUI
  * join key (broadcast hash join, never a nested loop — the 100 TB
  * point), and the NULLed dimension row must actually capture the
  * NULLed fact keys a plain equi join drops.
  */
class NullSafeJoinSpec extends SparkSuite {

  private def q = graft.SparkEntry.queries("q_join_null_safe")(spark, sfDir)

  test("null-safe equality plans as a broadcast hash join") {
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"<=> did not plan as a hash join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"<=> degenerated to a nested loop:\n$plan")
  }

  test("the unknown-dimension row captures the NULLed fact keys") {
    // nation 13's name must appear with exactly the customers whose
    // c_nationkey = 13 (matched via NULL <=> NULL)
    val natName = Tables.nation(spark, sfDir)
      .where(col("n_nationkey") === 13)
      .select(col("n_name")).collect()(0).getString(0)
    val want = Tables.customer(spark, sfDir)
      .where(col("c_nationkey") === 13).count()
    val got = q.where(col("n_name") === natName)
      .select(col("n_cust")).collect()(0).getLong(0)
    assert(got == want, s"null-matched count $got != $want")
    // and a plain equi join on the NULLed keys finds none of them
    val cust = Tables.customer(spark, sfDir)
      .withColumn("nk", expr("nullif(c_nationkey, 13)"))
    val nat = Tables.nation(spark, sfDir)
      .withColumn("nk", expr("nullif(n_nationkey, 13)"))
    val dropped = cust.join(nat, cust("nk") === nat("nk"))
      .where(col("n_nationkey") === 13).count()
    assert(dropped == 0L)
  }
}
