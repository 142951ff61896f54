package streamline

import graft.SparkSuite
import streamline.batch.{Relational, SkewJoin}

/** Pins q_scan_agg_pushdown's scale claim: under the V2 parquet path
  * with `aggregatePushdown` on, the COUNT/MIN/MAX aggregate is
  * answered from row-group footer statistics — the executed plan
  * carries `PushedAggregation` with every aggregate listed, and no
  * regular Aggregate over scan output remains below it. Without the
  * conf the same plan must NOT push (the witness distinguishes the
  * lever, not just the answer). */
class ScanAggPushdownSpec extends SparkSuite {

  private val confs = Seq(
    "spark.sql.parquet.aggregatePushdown" -> "true",
    "spark.sql.sources.useV1SourceList" -> "")

  // Loose, case-insensitive patterns rather than exact plan-string
  // fragments: the toString rendering of V2 scan nodes is not a stable
  // API, and a Spark minor-version formatting change must not fail the
  // suite without a behavior change. What is pinned: a pushed-
  // aggregation marker exists, and each aggregate appears (any
  // spacing/case) somewhere after it.
  private def assertPushed(plan: String): Unit = {
    val marker = "(?i)pushedaggregation".r
    assert(marker.findFirstIn(plan).isDefined, plan.take(2000))
    Seq("count\\s*\\(\\s*\\*\\s*\\)", "min\\s*\\(\\s*l_orderkey\\s*\\)",
      "max\\s*\\(\\s*l_orderkey\\s*\\)", "min\\s*\\(\\s*l_quantity\\s*\\)",
      "max\\s*\\(\\s*l_quantity\\s*\\)").foreach(a =>
      assert(("(?is)pushedaggregation.*" + a).r.findFirstIn(plan).isDefined,
        s"missing /$a/ after pushedaggregation in:\n${plan.take(2000)}"))
  }

  test("footer-stat aggregate pushes COUNT/MIN/MAX into the scan") {
    val sp = spark
    SkewJoin.withConfs(sp, confs) {
      val df = Relational.pushedAggPlan(sp, sfDir)
      df.collect() // force planning + execution under the confs
      assertPushed(df.queryExecution.executedPlan.toString)
    }
  }

  test("without the conf the aggregate does not push") {
    val sp = spark
    val df = Relational.pushedAggPlan(sp, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("(?i)pushedaggregation".r.findFirstIn(plan).isEmpty,
      plan.take(2000))
  }

  test("pushed and unpushed answers agree") {
    val sp = spark
    val unpushed = Relational.pushedAggPlan(sp, sfDir).collect().toSeq
    val pushed = SkewJoin.withConfs(sp, confs) {
      Relational.pushedAggPlan(sp, sfDir).collect().toSeq
    }
    assert(pushed == unpushed)
  }
}
