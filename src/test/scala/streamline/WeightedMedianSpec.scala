package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_agg_weighted_median against an in-JVM brute force over the
  * collected sf0.001 lineitem (plain sort + scan — independent of the
  * window-cumsum plan), plus the definitional invariant: the reported
  * value is the SMALLEST v whose cumulative weight reaches half the
  * group total.
  */
class WeightedMedianSpec extends SparkSuite {

  test("matches an in-JVM brute-force lower weighted median") {
    val rows = Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2).toLong))
    val expected = rows.groupBy(_._1).map { case (flag, g) =>
      val sorted = g.map(t => (t._2, t._3)).sortBy(_._1)
      val total = sorted.map(_._2).sum
      var cum = 0L
      val v = sorted.find { case (_, w) => cum += w; 2 * cum >= total }.get._1
      (flag, v, total)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q_agg_weighted_median")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq === expected)
    // half-weight property, checked from the raw data per group
    got.foreach { case (flag, v, total) =>
      val g = rows.filter(_._1 == flag)
      val below = g.filter(_._2 < v).map(_._3).sum
      val atOrBelow = g.filter(_._2 <= v).map(_._3).sum
      assert(2 * atOrBelow >= total, s"$flag: $v reaches half the weight")
      assert(2 * below < total, s"$flag: $v is the SMALLEST such value")
    }
  }
}
