package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_agg_seasonality and q_win_gap_stats against INDEPENDENT
  * in-JVM brute forces over the collected sf0.001 events — a literal
  * day-of-week tally and a literal sorted-gap selection — so a dow
  * phase error, a wrong deviation cross-multiplication, or a
  * percentile index off-by-one cannot cancel out. */
class SeasonGapSpec extends SparkSuite {

  private def r6(num: BigInt, den: BigInt): Double =
    ((BigInt(2000000) * num + den) / (2 * den)).toDouble / 1000000.0

  private def us(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  test("dow profile matches a literal tally (and 1970-01-04 is Sunday)") {
    // anchor the phase convention: epoch day 3 = 1970-01-04, a Sunday
    assert((3L + 4) % 7 == 0L)
    val evs = Tables.events(spark, sfDir)
      .select("event_type", "ts").collect()
      .map(r => (r.getString(0),
        (math.floor(us(r.getTimestamp(1)).toDouble / 86400000000.0)
          .toLong + 4) % 7))
    val expected = evs.groupBy(_._1).toSeq.flatMap { case (t, xs) =>
      val n = xs.length.toLong
      xs.groupBy(_._2).toSeq.map { case (d, ys) =>
        val c = ys.length.toLong
        (t, d, c, n, r6(BigInt(c), BigInt(n)), 7 * c - n)
      }
    }.sortBy(x => (x._1, x._2))
    val got = SparkEntry.queries("q_agg_seasonality")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5))).toSeq
    assert(got === expected)
    // non-degenerate: the week is not uniform
    assert(got.exists(_._6 != 0))
  }

  test("gap order statistics match a literal sorted-gap selection") {
    val evs = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), us(r.getTimestamp(2))))
    val expected = evs.groupBy(_._1).toSeq.map { case (u, rs) =>
      val ord = rs.sortBy(x => (x._3, x._2)).map(_._3)
      val gaps = ord.zip(ord.drop(1)).map { case (a, b) => b - a }.sorted
      val n = gaps.length.toLong
      (u, n, gaps.head, gaps(((n + 1) / 2).toInt - 1),
        gaps(((9 * n + 9) / 10).toInt - 1), gaps.last)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_win_gap_stats")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
    // the discrete selections are really order statistics
    assert(got.forall(x =>
      x._3 <= x._4 && x._4 <= x._5 && x._5 <= x._6))
  }
}
