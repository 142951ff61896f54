package streamline

import graft.{SparkEntry, SparkSuite}
import streamline.plans.RangeBinRule

/** RangeBinRule pins (SURVEY.md §2.3 q_join_range):
  * 1. semantics-preserving: identical rows with the rule on and off
  *    (off = stock Spark broadcast nested loop) — the rewrite keeps the
  *    original band predicate as a residual, so this must hold exactly;
  * 2. plan shape: with the rule on the band join goes through a bin
  *    EQUALITY join (hash/merge, keyed shuffle) — no nested loop, no
  *    cartesian; with the rule off it is the nested loop (documenting
  *    the gap the rule closes);
  * 3. the rule leaves equi-keyed joins alone.
  *
  * The witness installs the rule itself, so "off" is expressed through
  * the conf gate (binSeconds = 0), set AFTER building the DataFrame and
  * before its lazy optimization — optimization reads the conf at
  * execution time. sf0.01 (not the suite default sf0.001) because the
  * ±1 min error×purchase band has no matches at the smallest scale.
  */
class RangeBinSpec extends SparkSuite {

  private val dir01 = "/root/testdata/sf0.01"

  private def run() =
    SparkEntry.queries("q_join_range")(spark, dir01)

  private def withRuleOff[A](body: => A): A = {
    // run() has just re-installed (conf = 60); gate the rule off for
    // anything optimized inside body.
    spark.conf.set(RangeBinRule.BinConf, "0")
    try body finally spark.conf.set(RangeBinRule.BinConf, "60")
  }

  test("rewrite preserves the band-join result exactly") {
    val on = run().collect().toSeq
    val offDf = run()
    val off = withRuleOff(offDf.collect().toSeq)
    assert(on === off)
    assert(on.nonEmpty, "fixture should produce band matches")
  }

  test("rule on: bin-equality join, no nested loop; rule off: nested loop") {
    val pOn = run().queryExecution.executedPlan.toString
    assert(!pOn.contains("BroadcastNestedLoopJoin") &&
      !pOn.contains("CartesianProduct"),
      s"band join should be bin-keyed with the rule on:\n${pOn.take(600)}")
    assert(pOn.contains("graft_bin"), "bin key missing from the plan")

    val offDf = run()
    val pOff = withRuleOff(offDf.queryExecution.executedPlan.toString)
    assert(pOff.contains("BroadcastNestedLoopJoin") ||
      pOff.contains("CartesianProduct"),
      "without the rule this is the nested-loop gap the rule closes")
  }

  test("equi-keyed joins are untouched") {
    RangeBinRule.install(spark)
    val p = SparkEntry.queries("q_join_interval")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("graft_bin"),
      "interval join has an equi key; the rule must not fire")
  }

  private def evts() = {
    val sp = spark; import sp.implicits._
    // Tables.events converts the raw int64-ns column to a µs
    // TimestampType — the type the rule's band detection requires.
    streamline.Tables.events(spark, dir01).select($"event_id", $"ts")
  }

  test("one-sided inequality (unbounded band) is NOT rewritten") {
    val sp = spark; import sp.implicits._
    RangeBinRule.install(spark)
    val l = evts().toDF("l_id", "l_ts")
    val r = evts().toDF("r_id", "r_ts")
    val p = l.join(r, $"l_ts" < $"r_ts")
      .queryExecution.optimizedPlan.toString
    assert(!p.contains("graft_bin"),
      "no upper+lower pair ⇒ the bin±1 explode would drop pairs >1 bin apart")
  }

  test("band wider than binSeconds conf is NOT rewritten") {
    val sp = spark; import sp.implicits._
    RangeBinRule.install(spark, binSeconds = 60L)
    val l = evts().toDF("l_id", "l_ts")
    val r = evts().toDF("r_id", "r_ts")
    val p = l.join(r,
        $"r_ts" >= $"l_ts" - org.apache.spark.sql.functions.expr("INTERVAL 2 HOURS") &&
          $"r_ts" <= $"l_ts" + org.apache.spark.sql.functions.expr("INTERVAL 2 HOURS"))
      .queryExecution.optimizedPlan.toString
    assert(!p.contains("graft_bin"),
      "a 2h band exceeds the 60s gate; rewriting would be incomplete")
  }

  test("wide band IS rewritten once the gate admits it, with derived bins") {
    val sp = spark; import sp.implicits._
    RangeBinRule.install(spark, binSeconds = 7200L)
    try {
      val l = evts().toDF("l_id", "l_ts")
      val r = evts().toDF("r_id", "r_ts")
      val p = l.join(r,
          $"r_ts" >= $"l_ts" - org.apache.spark.sql.functions.expr("INTERVAL 2 HOURS") &&
            $"r_ts" <= $"l_ts" + org.apache.spark.sql.functions.expr("INTERVAL 2 HOURS"))
        .queryExecution.optimizedPlan.toString
      assert(p.contains("graft_bin"), s"2h band fits a 7200s gate:\n$p")
      assert(p.contains("/ 7200.0"),
        "bin width must be derived from the verified band (7200s), " +
          s"not hard-wired:\n${p.take(800)}")
    } finally spark.conf.set(RangeBinRule.BinConf, "60")
  }

  test("null-safe-equality (<=>) keyed joins are untouched") {
    val sp = spark; import sp.implicits._
    RangeBinRule.install(spark)
    val l = evts().toDF("l_id", "l_ts")
    val r = evts().toDF("r_id", "r_ts")
    val p = l.join(r,
        $"l_id" <=> $"r_id" &&
          $"r_ts" >= $"l_ts" - org.apache.spark.sql.functions.expr("INTERVAL 1 MINUTE") &&
          $"r_ts" <= $"l_ts" + org.apache.spark.sql.functions.expr("INTERVAL 1 MINUTE"))
      .queryExecution.optimizedPlan.toString
    assert(!p.contains("graft_bin"),
      "<=> is an equi conjunct; adding an explode+shuffle is pure loss")
  }
}
