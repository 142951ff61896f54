package streamline

import graft.SparkSuite

/** Pins q_join_bloom_runtime (SURVEY.md §2.3): with the thresholds
  * lowered, InjectRuntimeFilter must actually plant a bloom probe
  * (`might_contain`) on the big side of the shuffle join, and the
  * result must equal the rule-off run — the filter is a pure
  * shuffle-bytes optimization, never a semantics change.
  */
class BloomRuntimeSpec extends SparkSuite {

  test("runtime bloom filter is injected on the application side") {
    streamline.batch.SkewJoin.withConfs(spark,
      streamline.batch.Joins.bloomConfs) {
      val df = streamline.batch.Joins.bloomRuntimeRaw(spark, sfDir)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom probe in the optimized plan:\n$plan")
    }
  }

  test("bloom injection does not change the result") {
    val on = graft.SparkEntry.queries("q_join_bloom_runtime")(spark, sfDir)
      .collect().toSeq
    // Default thresholds (10 GB application side) → no injection.
    val off = streamline.batch.Joins.bloomRuntimeRaw(spark, sfDir)
      .orderBy(org.apache.spark.sql.functions.col("s_nationkey"))
      .collect().toSeq
    assert(on == off)
    assert(on.nonEmpty)
  }
}
