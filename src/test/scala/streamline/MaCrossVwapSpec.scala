package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_win_ma_cross and q_win_vwap against independent in-JVM brute
  * forces: a literal sliding-sum walk with cross-multiplied comparison
  * (no division anywhere, like the query) and a literal integer
  * revenue/quantity accumulation. */
class MaCrossVwapSpec extends SparkSuite {

  private def r6(num: BigInt, den: BigInt): Double = {
    val mag = (BigInt(2000000) * num.abs + den) / (2 * den)
    (if (num < 0) -mag else mag).toDouble / 1e6
  }

  private def us(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  test("ma crossings match a literal sliding-sum walk") {
    val rows = Tables.events(spark, sfDir).select("event_type", "ts")
      .collect().map(r => (r.getString(0),
        math.floor(us(r.getTimestamp(1)).toDouble / 86400000000.0).toLong))
    val counts = rows.groupBy(identity)
      .map { case (k, xs) => k -> xs.length.toLong }
    val days = rows.map(_._2).distinct.sorted
    val expected = rows.map(_._1).distinct.sorted.flatMap { t =>
      val c = days.map(d => counts.getOrElse((t, d), 0L))
      val sgns = days.indices.map { i =>
        if (i < 9) None
        else {
          val s3 = c.slice(i - 2, i + 1).sum
          val s10 = c.slice(i - 9, i + 1).sum
          val sgn = if (10 * s3 > 3 * s10) 1L
                    else if (10 * s3 < 3 * s10) -1L else 0L
          Some((days(i), sgn, s3, s10))
        }
      }.flatten
      sgns.sliding(2).collect {
        case Seq((_, p, _, _), (d, s, s3, s10))
          if p != 0 && s != 0 && p != s => (t, d, p, s, s3, s10)
      }
    }
    val got = SparkEntry.queries("q_win_ma_cross")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
    // crossings occur in both directions on the fixture
    assert(got.exists(_._4 == 1L) && got.exists(_._4 == -1L))
  }

  test("vwap matches literal integer revenue/quantity accumulation") {
    val rows = Tables.lineitem(spark, sfDir)
      .select("l_shipdate", "l_extendedprice", "l_discount", "l_quantity")
      .collect().map { r =>
        val wk = math.floor(us(r.getTimestamp(0)).toDouble
          / 604800000000.0).toLong
        (wk, math.round(r.getDouble(1) * 100),
          math.round(r.getDouble(2) * 100), math.round(r.getDouble(3)))
      }
    val expected = rows.groupBy(_._1).toSeq.map { case (wk, xs) =>
      val rev = xs.map(x => BigInt(x._2) * (100 - x._3)).sum
      val qty = xs.map(_._4).sum
      (wk, xs.length.toLong, qty, rev.toString,
        r6(rev, BigInt(qty) * 10000))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_win_vwap")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4))).toSeq
    assert(got === expected)
    // price level is non-degenerate across weeks
    assert(got.map(_._5).distinct.size > 1)
  }
}
