package streamline

import graft.SparkSuite
import streamline.batch.SkewJoin

/** Pins the q_join_skew witness: AQE's OptimizeSkewedJoin must actually
  * split the planted hot partition at runtime — a green CORRECTNESS row
  * alone would also pass with the rule silently not firing. */
class SkewJoinPlanSpec extends SparkSuite {

  // sf0.001 partitions are smaller than the sf0.01 bench run's, so push
  // the (already harness-scaled) byte floors further down; the ratio
  // test (factor × median) is the production-relevant trigger.
  private val specConfs = SkewJoin.skewConfs ++ Seq(
    
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB")

  test("OptimizeSkewedJoin splits the hot partition (skew=true in final plan)") {
    val plan = SkewJoin.withConfs(spark, specConfs) {
      val df = SkewJoin.skewJoinStage(spark, sfDir)
      df.collect() // materialize so AQE finalizes the adaptive plan
      df.queryExecution.executedPlan.toString
    }
    assert(plan.contains("skew=true"),
      s"no skew-split in final adaptive plan:\n$plan")
  }

  test("salted join builds its hash on the replicated dimension side") {
    // the shuffle_hash hint sits on the dim: the build table must be
    // the dimension (8x-replicated but still tiny), never the fact
    val plan = graft.SparkEntry.queries("q_join_salted")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), s"not a shuffle hash join:\n$plan")
    assert(plan.contains("BuildRight"),
      s"hash build must sit on the dim (right) side:\n$plan")
  }

  test("salted join spreads the hot key over all salts") {
    import org.apache.spark.sql.functions._
    val sparkI = graft.SparkTestBase.spark
    import sparkI.implicits._
    // The salt column is internal to q_join_salted; re-derive the salted
    // fact here and check the hot key occupies every salt bucket.
    val nSalt = 8
    val salts = Tables.lineitem(spark, sfDir)
      .where(pmod($"l_orderkey", lit(4)) < 3)
      .select(pmod(hash($"l_orderkey", $"l_linenumber"), lit(nSalt))
        .as("salt"))
      .distinct().count()
    assert(salts == nSalt.toLong,
      s"hot key rows landed in only $salts of $nSalt salt buckets")
  }
}
