package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_win_zscore and q_win_pop against INDEPENDENT in-JVM brute
  * forces over the collected sf0.001 events — a literal trailing-20
  * walk per user and a literal week-lag walk per type — so a frame
  * off-by-one (current row leaking into its own baseline), a wrong
  * integer cross-multiplication, or a gap-week mispairing cannot
  * cancel out. */
class ZscorePopSpec extends SparkSuite {

  private def r6(num: BigInt, den: BigInt): Double =
    ((BigInt(2000000) * num + den) / (2 * den)).toDouble / 1000000.0

  private def rows() = Tables.events(spark, sfDir)
    .select("user_id", "event_id", "ts", "event_type", "value").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
      r.getString(3), r.getDouble(4)))

  test("zscore flags match a literal trailing-20 walk") {
    val expected = rows().groupBy(_._1).toSeq.flatMap { case (u, rs) =>
      val ord = rs.sortBy(x => (x._3.getTime, x._2))
        .map(x => (x._2, math.round(x._5 * 10000)))
      ord.indices.drop(20).flatMap { i =>
        val win = ord.slice(i - 20, i).map(_._2)
        val (v, s, q) = (ord(i)._2, win.sum, win.map(x => x * x).sum)
        val dev2 = (20 * v - s) * (20 * v - s)
        val var9 = 9 * (20 * q - s * s)
        if (dev2 > var9) Some((u, ord(i)._1, v, 20L, s, dev2, var9))
        else None
      }
    }.sortBy(x => (x._1, x._2))
    val got = SparkEntry.queries("q_win_zscore")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === expected)
    // non-degenerate both ways: some flagged, most not
    assert(got.nonEmpty && got.length < rows().length / 10)
  }

  test("pop deltas and ratios match a literal week-lag walk") {
    val expected = rows()
      .groupBy(x => (x._4, math.floor(
        (x._3.getTime * 1000L + (x._3.getNanos / 1000) % 1000).toDouble /
          604800000000.0).toLong))
      .map { case (k, xs) => k -> xs.length.toLong }.toSeq
      .groupBy(_._1._1).toSeq.flatMap { case (t, wk) =>
        val ord = wk.map { case ((_, w), c) => (w, c) }.sortBy(_._1)
        ord.zip(ord.drop(1)).map { case ((_, prev), (w, c)) =>
          (t, w, c, prev, c - prev, r6(BigInt(c), BigInt(prev)))
        }
      }.sortBy(x => (x._1, x._2))
    val got = SparkEntry.queries("q_win_pop")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got === expected)
    // non-degenerate: at least one shrinking and one growing week
    assert(got.exists(_._5 < 0) && got.exists(_._5 > 0))
  }
}
