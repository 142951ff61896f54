package streamline

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._
import streamline.agg.ThetaSketchDistinct.theta_distinct

/** q_agg_sketch_theta is oracle-omitted (sketch estimates are
  * engine-specific), so its correctness witnesses live here:
  *
  *  1. Exactness below k: a theta sketch with default k=4096 is an
  *     exact distinct set until 4096 distincts — at test scale every
  *     group is far below that, so the estimate must EQUAL the exact
  *     `count(distinct)` per group.
  *  2. Merge-order independence: the declared query's result must be
  *     identical under a different partitioning of the same input
  *     (partial sketches merge through shuffle in a different order).
  */
class ThetaSketchSpec extends SparkSuite {

  test("theta estimate equals exact distinct below k") {
    val s = spark
    import s.implicits._
    val got = SparkEntry.queries("q_agg_sketch_theta")(spark, sfDir)
      .select($"event_type", $"approx_users")
    val exact = Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact_users"))
    val joined = got.join(exact, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("approx_users") == r.getAs[Long]("exact_users"),
        s"sketch != exact for ${r.getAs[String]("event_type")}")
    }
  }

  test("sketch merge is partitioning/merge-order independent") {
    val s = spark
    import s.implicits._
    val base = Tables.events(spark, sfDir)
    def run(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.groupBy($"event_type")
        .agg(theta_distinct($"user_id").as("u"))
        .as[(String, Long)].collect().toMap
    val a = run(base.repartition(1))
    val b = run(base.repartition(7, $"user_id"))
    val c = run(base.repartition(3, $"event_type"))
    assert(a == b && b == c)
  }

  test("sketch set algebra is exact below k") {
    val s = spark
    import s.implicits._
    val row = SparkEntry.queries("q_agg_sketch_algebra")(spark, sfDir)
      .collect().head
    val ev = Tables.events(spark, sfDir)
    def users(t: String): Set[Long] =
      ev.where($"event_type" === t).select($"user_id")
        .as[Long].collect().toSet
    val (ck, pu) = (users("click"), users("purchase"))
    assert(row.getAs[Long]("both") == (ck & pu).size.toLong)
    assert(row.getAs[Long]("either") == (ck | pu).size.toLong)
    assert(row.getAs[Long]("click_only") == (ck -- pu).size.toLong)
  }

  test("string inputs sketch correctly too") {
    val s = spark
    import s.implicits._
    val est = Tables.documents(spark, sfDir)
      .agg(theta_distinct($"lang").as("n")).as[Long].head()
    val exact = Tables.documents(spark, sfDir)
      .select(countDistinct($"lang")).as[Long].head()
    assert(est == exact)
  }

  test("streaming sketch aggregate equals exact distinct below k") {
    // q_stream_sketch: the TypedImperativeAggregate runs inside an
    // update-mode streaming query (state-store-serialized buffers,
    // incremental merge per micro-batch); below k the final estimate
    // is exact, so it must equal the batch count(distinct) per key.
    val s = spark
    import s.implicits._
    val got = SparkEntry.queries("q_stream_sketch")(spark, sfDir)
      .as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, sfDir)
      .groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == exact)
  }
}
