package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_agg_basket against an INDEPENDENT in-JVM brute force over the
  * collected sf0.001 lineitem — literal nested-loop pair enumeration
  * per order basket — so a wrong join condition (p ≤ p, cross-order
  * pairs, undeduped line rows) or a top-20 tie mishandled cannot
  * cancel out. */
class BasketSpec extends SparkSuite {

  private def r6(num: BigInt, den: BigInt): Double =
    ((BigInt(2000000) * num + den) / (2 * den)).toDouble / 1000000.0

  test("top-20 pair support/conf/lift match a nested-loop enumeration") {
    val bp = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getAs[Number](0).longValue,
        r.getAs[Number](1).longValue)).distinct
    val baskets = bp.map(_._1).distinct.length.toLong
    val n1 = bp.groupBy(_._2).map { case (p, xs) => p -> xs.length.toLong }
    val pairCounts = collection.mutable.Map.empty[(Long, Long), Long]
    bp.groupBy(_._1).values.foreach { items =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        pairCounts((ps(i), ps(j))) =
          pairCounts.getOrElse((ps(i), ps(j)), 0L) + 1L
    }
    val top = pairCounts.toSeq
      .sortBy { case ((p1, p2), c) => (-c, p1, p2) }.take(20)
    val expected = top.map { case ((p1, p2), c) =>
      (p1, p2, c, n1(p1), n1(p2), baskets,
        r6(BigInt(c), BigInt(n1(p1))),
        r6(BigInt(c) * baskets, BigInt(n1(p1)) * n1(p2)))
    }
    val got = SparkEntry.queries("q_agg_basket")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7))).toSeq
    assert(got === expected)
    // non-degenerate: a real tie block crosses the top-20 boundary at
    // this SF, so the (n12, p1, p2) total order is actually exercised
    assert(got.map(_._3).distinct.size > 1)
    // lift sanity: co-occurrence of top pairs beats independence
    assert(got.head._8 > 1.0)
  }
}
