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

  test("footer-stat aggregate pushes COUNT/MIN/MAX into the scan") {
    val sp = spark
    SkewJoin.withConfs(sp, confs) {
      val df = Relational.pushedAggPlan(sp, sfDir)
      df.collect() // force planning + execution under the confs
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation"), plan.take(2000))
      Seq("COUNT(*)", "MIN(l_orderkey)", "MAX(l_orderkey)",
        "MIN(l_quantity)", "MAX(l_quantity)").foreach(a =>
        assert(plan.contains(a), s"missing $a in:\n${plan.take(2000)}"))
    }
  }

  test("without the conf the aggregate does not push") {
    val sp = spark
    val df = Relational.pushedAggPlan(sp, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("PushedAggregation"), plan.take(2000))
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
