package streamline

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins the mechanism behind q_cache_reuse (SURVEY.md §2): a persisted
  * aggregate must serve its second consumer from InMemoryTableScan —
  * the shuffle+agg runs once, reuse is a columnar cache read, not a
  * recompute.
  */
class CacheReuseSpec extends SparkSuite {

  test("second consumer of a persisted aggregate reads the cache") {
    val s = spark
    import s.implicits._
    val base = Tables.lineitem(spark, sfDir)
      .groupBy($"l_suppkey")
      .agg(count(lit(1)).as("n_items"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      base.count() // materialize
      val second = base.where($"n_items" >= 1)
        .agg(count(lit(1)).as("n"))
      val plan = second.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"),
        s"second consumer did not read the cache:\n$plan")
      // and the cached result is actually correct
      val viaCache = second.collect().head.getLong(0)
      val fresh = Tables.lineitem(spark, sfDir)
        .select($"l_suppkey").distinct().count()
      assert(viaCache == fresh)
    } finally base.unpersist()
  }
}
