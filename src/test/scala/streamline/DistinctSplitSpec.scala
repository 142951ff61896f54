package streamline

import graft.SparkSuite
import graft.TestImplicits._
import org.apache.spark.sql.functions._

/** Pins q_agg_distinct_split (SURVEY.md §2.4): the two-phase bucketed
  * COUNT(DISTINCT) must be exactly the one-phase answer (buckets
  * partition the value domain), and the plan must genuinely carry two
  * keyed aggregation phases — otherwise the witness degrades into a
  * plain distinct with extra columns.
  */
class DistinctSplitSpec extends SparkSuite {

  private def split = graft.SparkEntry.queries("q_agg_distinct_split")(spark, sfDir)

  test("two-phase bucketed count-distinct equals the one-phase spelling") {
    val direct = Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"event_type")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val got = split.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == direct.toSeq)
  }

  test("plan has two aggregation phases on different grouping keys") {
    // inner phase groups by (event_type, bucket), outer by event_type:
    // both appear as HashAggregate keys in the physical plan
    val plan = split.queryExecution.executedPlan.toString
    // Catalyst folds the `bucket` alias into a synthetic grouping
    // expression — its presence is the inner (group, bucket) phase
    assert(plan.contains("_groupingexpression") || plan.contains("bucket"),
      s"inner bucket key missing:\n$plan")
    val aggs = "HashAggregate".r.findAllIn(plan).size
    assert(aggs >= 4, // partial+final per phase
      s"expected >=4 HashAggregate nodes (2 phases x partial/final), got $aggs:\n$plan")
  }

  test("the hot distinct key spreads across buckets") {
    // per (event_type, bucket) partial counts: for any event_type with
    // >= 8 distinct users (the sf0.001 fixture has 15 per type), more
    // than one of the 16 buckets must be populated
    val buckets = Tables.events(spark, sfDir)
      .groupBy($"event_type", pmod(xxhash64($"user_id"), lit(16L)).as("b"))
      .agg(countDistinct($"user_id").as("pc"))
      .groupBy($"event_type")
      .agg(countDistinct($"b").as("nb"), sum($"pc").as("n"))
      .where($"n" >= 8)
      .select(min($"nb"))
      .collect()(0).getLong(0)
    assert(buckets > 1, s"hot groups landed in a single bucket: $buckets")
  }
}
