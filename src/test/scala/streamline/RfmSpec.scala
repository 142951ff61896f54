package streamline

import java.time.ZoneOffset

import graft.{SparkEntry, SparkSuite}

/** Pins q_win_rfm against an INDEPENDENT in-JVM brute force over the
  * collected sf0.001 orders/customer tables — a hand-rolled per-nation
  * ntile(5) on each of the three (recency, frequency, monetary) sort
  * keys — so a wrong tile boundary, a flipped sort direction, or a
  * recency anchored on the wrong side of the day cast cannot cancel
  * out in the segment rollup. */
class RfmSpec extends SparkSuite {

  // ntile(k) over a pre-sorted seq: first (n mod k) buckets get one extra
  private def ntile[A](sorted: Seq[A], k: Int): Seq[(A, Long)] = {
    val n = sorted.length
    val base = n / k; val extra = n % k
    val cut = extra * (base + 1)
    sorted.zipWithIndex.map { case (a, i) =>
      val t = if (i < cut) i / (base + 1) else extra + (i - cut) / base
      (a, t + 1L)
    }
  }

  test("rfm segment rollup matches a hand-rolled per-nation ntile") {
    val nat = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_nationkey").collect()
      .map(r => r.getAs[Number](0).longValue ->
        r.getAs[Number](1).longValue).toMap
    // per (nation, customer): last order instant, count, cents
    val per = Tables.orders(spark, sfDir)
      .select("o_custkey", "o_orderdate", "o_totalprice").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getTimestamp(1),
        math.round(r.getDouble(2) * 100)))
      .groupBy(_._1).map { case (c, os) =>
        (nat(c), c, os.map(_._2).maxBy(_.getTime), os.length.toLong,
          os.map(_._3).sum)
      }.toSeq
    val anchorDay = per.map(_._3).maxBy(_.getTime)
      .toInstant.atZone(ZoneOffset.UTC).toLocalDate.toEpochDay
    // per-nation quintile scores on the three sort keys
    val scores = per.groupBy(_._1).flatMap { case (_, rows) =>
      val r5 = ntile(rows.sortBy(x => (-x._3.getTime, x._2)), 5)
        .map { case (x, t) => x._2 -> t }.toMap
      val f5 = ntile(rows.sortBy(x => (-x._4, x._2)), 5)
        .map { case (x, t) => x._2 -> t }.toMap
      val m5 = ntile(rows.sortBy(x => (-x._5, x._2)), 5)
        .map { case (x, t) => x._2 -> t }.toMap
      rows.map { case (_, c, last, freq, cents) =>
        val recDays = anchorDay -
          last.toInstant.atZone(ZoneOffset.UTC).toLocalDate.toEpochDay
        (r5(c), f5(c), m5(c), recDays, freq, cents)
      }
    }.toSeq
    val expected = scores.groupBy(x => (x._1, x._2, x._3))
      .map { case (k, xs) =>
        k -> ((xs.length.toLong, xs.map(_._6).sum, xs.map(_._4).min,
          xs.map(_._5).max))
      }
    val got = SparkEntry.queries("q_win_rfm")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got === expected)
    // non-degenerate: scores span the full 1..5 range on each axis
    assert(got.keys.map(_._1).toSet === Set(1L, 2L, 3L, 4L, 5L))
    assert(got.keys.map(_._2).toSet === Set(1L, 2L, 3L, 4L, 5L))
    assert(got.keys.map(_._3).toSet === Set(1L, 2L, 3L, 4L, 5L))
    // population adds up: segment counts sum to the customer base
    assert(got.values.map(_._1).sum === per.length.toLong)
  }
}
