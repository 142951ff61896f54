package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_win_ohlc and q_agg_corr_matrix against INDEPENDENT in-JVM
  * brute forces over the collected sf0.001 events — a literal
  * sorted-walk candle build and a literal densified-moment
  * computation — so a tie-dependent open/close pick, a missing
  * zero-day in the grid, or a sign slipped in the squared-correlation
  * algebra cannot cancel out. */
class OhlcCorrSpec extends SparkSuite {

  private def r6(num: BigInt, den: BigInt): Double =
    ((BigInt(2000000) * num + den) / (2 * den)).toDouble / 1000000.0

  private def us(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def rows() = Tables.events(spark, sfDir)
    .select("event_type", "ts", "event_id", "value").collect()
    .map(r => (r.getString(0), us(r.getTimestamp(1)), r.getLong(2),
      math.round(r.getDouble(3) * 10000)))

  private def day(u: Long): Long =
    math.floor(u.toDouble / 86400000000.0).toLong

  test("candles match a literal sorted walk per (type, day)") {
    val expected = rows().groupBy(x => (x._1, day(x._2))).toSeq
      .map { case ((t, d), xs) =>
        val ord = xs.sortBy(x => (x._2, x._3)).map(_._4)
        (t, d, ord.length.toLong, ord.head, ord.max, ord.min, ord.last)
      }.sortBy(x => (x._1, x._2))
    val got = SparkEntry.queries("q_win_ohlc")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === expected)
    // candles are real: some day moves (open != close)
    assert(got.exists(x => x._4 != x._7))
  }

  test("corr matrix matches literal densified moments") {
    val counts = rows().groupBy(x => (x._1, day(x._2)))
      .map { case (k, xs) => k -> xs.length.toLong }
    val types = counts.keys.map(_._1).toSeq.distinct.sorted
    val days = counts.keys.map(_._2).toSeq.distinct.sorted
    val series = types.map(t =>
      t -> days.map(d => counts.getOrElse((t, d), 0L))).toMap
    val n = days.length.toLong
    val expected = (for {
      i <- types.indices; j <- (i + 1) until types.length
      (t1, t2) = (types(i), types(j))
      (a, b) = (series(t1), series(t2))
      sx1 = a.sum; sx2 = b.sum
      // BigInt like the query's DECIMAL(38) moments (r16: c² and
      // n·Σxy − Σx·Σx overflow long at ~10¹² daily counts)
      sxx1 = a.map(x => BigInt(x) * x).sum; sxx2 = b.map(x => BigInt(x) * x).sum
      sxy = a.zip(b).map { case (x, y) => BigInt(x) * y }.sum
      cov = BigInt(n) * sxy - BigInt(sx1) * sx2
      v1 = BigInt(n) * sxx1 - BigInt(sx1) * sx1
      v2 = BigInt(n) * sxx2 - BigInt(sx2) * sx2
    } yield (t1, t2, cov, v1, v2, if (cov < 0) -1L else 1L,
      r6(cov * cov, v1 * v2))).sortBy(x => (x._1, x._2))
    val got = SparkEntry.queries("q_agg_corr_matrix")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1),
        BigInt(r.getDecimal(2).toBigInteger),
        BigInt(r.getDecimal(3).toBigInteger),
        BigInt(r.getDecimal(4).toBigInteger),
        r.getLong(5), r.getDouble(6))).toSeq
    assert(got === expected)
    // the matrix is non-trivial: both signs occur and r2 < 1
    assert(got.exists(_._6 == 1L) && got.exists(_._6 == -1L))
    assert(got.forall(x => x._7 >= 0.0 && x._7 < 1.0))
  }
}
