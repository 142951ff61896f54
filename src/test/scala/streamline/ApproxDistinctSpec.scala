package streamline

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Value pin for q_agg_approx_distinct (r11 verdict item 3) — the one
  * sanctioned no-oracle query that previously had only a smoke run:
  * the HLL++ estimate must sit within a few relative standard
  * deviations of the EXACT per-group distinct count (the shape
  * q_agg_distinct verifies exactly). `approx_count_distinct`'s default
  * rsd is 0.05; the bound here is 4·rsd. Not flaky: HLL++ is seed-free
  * — identical input bytes always produce the identical estimate — so
  * this pins a fixed value, and the 4σ headroom only buys transfer
  * across fixture regenerations. Runs at sf0.01, the driver's gate
  * scale, where per-group distincts are in the thousands (an estimator
  * stuck on the sparse exact-counting path would prove nothing). */
class ApproxDistinctSpec extends SparkSuite {

  val sparkI = graft.SparkTestBase.spark
  import sparkI.implicits._

  test("HLL++ estimate within 4 rsd of exact per-group distinct at sf0.01") {
    val dir = "/root/testdata/sf0.01"
    val approx = graft.SparkEntry.queries("q_agg_approx_distinct")(spark, dir)
      .select($"l_returnflag", $"approx_parts")
      .as[(String, Long)].collect().toMap
    val exact = Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("exact_parts"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet, "group sets differ")
    assert(exact.values.forall(_ > 1000),
      "fixture too sparse to exercise the estimator")
    exact.foreach { case (flag, ex) =>
      val relErr = math.abs(approx(flag) - ex).toDouble / ex
      assert(relErr <= 4 * 0.05,
        f"group $flag: approx ${approx(flag)} vs exact $ex " +
          f"(relErr $relErr%.4f > 4 rsd)")
    }
  }
}
