package streamline

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._
import graft.TestImplicits._

/** q_agg_corr / q_agg_mode (SURVEY.md §2.4): the exact-moment-sum
  * statistics must agree with Spark's built-in (merge-order-dependent)
  * aggregates to float tolerance, and the mode's tie-break must be
  * total. */
class AggCorrModeSpec extends SparkSuite {

  test("exact-sum corr/covar/slope match the built-ins to 1e-10 relative") {
    val out = SparkEntry.queries("q_agg_corr")(spark, sfDir)
      .select("l_returnflag", "corr_qty_price", "covar_pop", "slope")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val ref = Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(corr($"l_quantity", $"l_extendedprice").as("c"),
        covar_pop($"l_quantity", $"l_extendedprice").as("cv"),
        regr_slope($"l_extendedprice", $"l_quantity").as("sl"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out.keySet == ref.keySet)
    for ((k, (c, cv, sl)) <- out) {
      val (rc, rcv, rsl) = ref(k)
      def close(a: Double, b: Double) =
        math.abs(a - b) <= 1e-10 * math.max(math.abs(a), math.abs(b))
      assert(close(c, rc), s"$k corr $c vs builtin $rc")
      assert(close(cv, rcv), s"$k covar $cv vs builtin $rcv")
      assert(close(sl, rsl), s"$k slope $sl vs builtin $rsl")
    }
  }

  test("exact-sum skewness/kurtosis match the built-ins to 1e-10 relative") {
    val out = streamline.batch.Aggregates.aggSkewKurt(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("skew_qty"), r.getAs[Double]("kurt_qty"))).toMap
    val ref = Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(skewness($"l_quantity").as("sk"),
        kurtosis($"l_quantity").as("ku"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    assert(out.keySet == ref.keySet)
    for ((k, (sk, ku)) <- out) {
      val (rsk, rku) = ref(k)
      def close(a: Double, b: Double) =
        math.abs(a - b) <= 1e-10 * math.max(math.abs(a), math.abs(b))
      assert(close(sk, rsk), s"$k skew $sk vs builtin $rsk")
      assert(close(ku, rku), s"$k kurt $ku vs builtin $rku")
    }
  }

  test("corr magnitudes are sane (|corr| <= 1, n sums to row count)") {
    val rows = SparkEntry.queries("q_agg_corr")(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n")).sum ==
      Tables.lineitem(spark, sfDir).count())
    rows.foreach(r =>
      assert(math.abs(r.getAs[Double]("corr_qty_price")) <= 1.0))
  }

  test("mode ties break to the smallest value") {
    // two values with the same top count in one group
    val df = Seq(("g", 7.0), ("g", 7.0), ("g", 3.0), ("g", 3.0),
      ("g", 9.0)).toDF("l_returnflag", "l_quantity")
    df.createOrReplaceTempView("tie_probe")
    val mode = df
      .groupBy($"l_returnflag", $"l_quantity").agg(count(lit(1)).as("cnt"))
      .groupBy($"l_returnflag")
      .agg(max_by($"l_quantity", struct($"cnt", -$"l_quantity"))
        .as("mode_qty"))
      .collect().head.getDouble(1)
    assert(mode == 3.0, s"tie must break low, got $mode")
  }

  test("mode agrees with a row_number reference on the fixture") {
    import org.apache.spark.sql.expressions.Window
    val out = SparkEntry.queries("q_agg_mode")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val w = Window.partitionBy($"l_returnflag")
      .orderBy($"cnt".desc, $"l_quantity")
    val ref = Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag", $"l_quantity").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w)).where($"rn" === 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == ref)
  }
}
