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
        BigInt(r.getString(2)), BigInt(r.getString(3)),
        BigInt(r.getString(4)),
        r.getLong(5), r.getDouble(6))).toSeq
    assert(got === expected)
    // the matrix is non-trivial: both signs occur and r2 < 1
    assert(got.exists(_._6 == 1L) && got.exists(_._6 == -1L))
    assert(got.forall(x => x._7 >= 0.0 && x._7 < 1.0))
  }

  /** Pins [[streamline.batch.Aggregates.reducedR2]] at the magnitudes
    * the r17 reduction exists for: moments ~ 10²⁴, where the naive
    * cov² has ~48 digits and silently NULLs in DECIMAL(38) (the
    * ADVICE-r16 overflow). The expectation replicates the trim in
    * BigInt; a second small-moment case asserts the reduction is the
    * IDENTITY (k = 0) below 15 digits. */
  test("reducedR2 survives 10²⁴-scale moments and is exact below them") {
    import org.apache.spark.sql.functions.{col, expr}
    def run(cov: BigInt, v1: BigInt, v2: BigInt): Double =
      spark.sql(
        s"""SELECT CAST('$cov' AS DECIMAL(38,0)) AS cov,
            CAST('$v1' AS DECIMAL(38,0)) AS v1,
            CAST('$v2' AS DECIMAL(38,0)) AS v2""")
        .select(streamline.batch.Aggregates
          .reducedR2(col("cov"), col("v1"), col("v2")).as("r2"))
        .collect().head.getDouble(0)
    def trimmed(cov: BigInt, v1: BigInt, v2: BigInt): Double = {
      def k(v: BigInt) = math.max(0, v.toString.length - 15)
      val (k1r, k2) = (k(v1), k(v2))
      val k1 = k1r + (k1r + k2) % 2
      val a = cov.abs / BigInt(10).pow((k1 + k2) / 2)
      r6(a * a, (v1 / BigInt(10).pow(k1)) * (v2 / BigInt(10).pow(k2)))
    }
    val (cov, v1, v2) = (BigInt("-500000000000000000000042"),
      BigInt("1000000000000000123456789"),
      BigInt("700000000000000987654321"))
    val got = run(cov, v1, v2)
    assert(got === trimmed(cov, v1, v2))
    // trimming error stays far inside the 1e-6 grid vs the true ratio
    val truth = (BigDecimal(cov) * BigDecimal(cov) /
      (BigDecimal(v1) * BigDecimal(v2))).toDouble
    assert(math.abs(got - truth) < 1e-6)
    // below 15 digits the reduction is a no-op: exact r6 equality
    val (c0, w1, w2) = (BigInt(-123456), BigInt(9876543), BigInt(7654321))
    assert(run(c0, w1, w2) === r6(c0 * c0, w1 * w2))
  }
}
