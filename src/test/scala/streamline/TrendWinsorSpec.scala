package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins the r17 robust-stats aggregates against INDEPENDENT in-JVM
  * brute forces over the collected sf0.001 events: a literal densified
  * least-squares moment build (q_agg_trend), a literal sort-clamp-mean
  * (q_agg_winsor), a literal per-(event, replicate) multiplicity
  * replay (q_agg_bootstrap), and a literal two-half decile walk
  * (q_agg_rank_migration) — so a slipped grid zero-day, an off-by-one
  * rank cut, a wrong Poisson threshold, or a tie-broken ntile cannot
  * cancel against the DuckDB oracle (which shares SQL shape with the
  * query). */
class TrendWinsorSpec extends SparkSuite {

  private def r6(num: BigInt, den: BigInt): Double = {
    val mag = (BigInt(2000000) * num.abs + den) / (2 * den)
    (if (num < 0) -mag else mag).toDouble / 1e6
  }

  private def us(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def events() = Tables.events(spark, sfDir)
    .select("event_type", "ts", "event_id", "user_id", "value").collect()
    .map(r => (r.getString(0), us(r.getTimestamp(1)), r.getLong(2),
      r.getLong(3), r.getDouble(4)))

  private def day(u: Long): Long =
    math.floor(u.toDouble / 86400000000.0).toLong

  test("trend matches literal densified least-squares moments") {
    val rows = events()
    val counts = rows.groupBy(x => (x._1, day(x._2)))
      .map { case (k, xs) => k -> xs.length.toLong }
    val days = counts.keys.map(_._2).toSeq.distinct.sorted
    val d0 = days.min
    val types = counts.keys.map(_._1).toSeq.distinct.sorted
    val expected = types.map { t =>
      val xs = days.map(d => (BigInt(d - d0), BigInt(counts.getOrElse((t, d), 0L))))
      val n = BigInt(xs.length)
      val sx = xs.map(_._1).sum; val sy = xs.map(_._2).sum
      val sxx = xs.map(p => p._1 * p._1).sum
      val sxy = xs.map(p => p._1 * p._2).sum
      val num = n * sxy - sx * sy; val den = n * sxx - sx * sx
      (t, xs.length.toLong, num.toString, den.toString,
        r6(num, den), r6(sy, n))
    }
    val got = SparkEntry.queries("q_agg_trend")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got === expected)
    // the series genuinely trend: both slope signs occur
    assert(got.exists(_._5 > 0) && got.exists(_._5 < 0))
  }

  test("winsorized mean matches literal sort-clamp-mean") {
    val rows = events()
    val expected = rows.groupBy(_._1).toSeq.map { case (t, xs) =>
      val v4 = xs.map(x => math.round(x._5 * 10000)).sorted
      val n = v4.length
      val k = (n + 9) / 10
      val (lo, hi) = (v4(k - 1), v4(n - k))
      val wv = v4.map(v => math.min(math.max(v, lo), hi))
      (t, n.toLong, lo, hi, wv.sum, r6(BigInt(wv.sum), BigInt(n)))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_agg_winsor")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got === expected)
    // the clamp bites: winsorized mean differs from both cut points
    assert(got.forall(x => x._3 < x._4))
  }

  test("IQR/Tukey fences match literal sort-select-count") {
    val rows = events()
    val expected = rows.groupBy(_._1).toSeq.map { case (t, xs) =>
      val v4 = xs.map(x => math.round(x._5 * 10000)).sorted
      val n = v4.length
      val k = (n + 3) / 4
      val (q1, q3) = (v4(k - 1), v4(n - k))
      val iqr = q3 - q1
      val nLow = v4.count(v => 2 * v < 2 * q1 - 3 * iqr).toLong
      val nHigh = v4.count(v => 2 * v > 2 * q3 + 3 * iqr).toLong
      (t, n.toLong, q1, q3, iqr, nLow, nHigh,
        r6(BigInt(nLow + nHigh), BigInt(n)))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_agg_iqr")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getDouble(7))).toSeq
    assert(got === expected)
    // the fences bite on the heavy-tailed fixture
    assert(got.exists(x => x._6 + x._7 > 0))
  }

  test("bootstrap replicates match a literal multiplicity replay") {
    val rows = events()
    def mult(id: Long, b: Long): Long = {
      val h = ((id % 1000003L) * 2654435761L + b * 40503L) % 1000L
      if (h < 368) 0L else if (h < 736) 1L else if (h < 920) 2L
      else if (h < 981) 3L else if (h < 996) 4L else 5L
    }
    val expected = (for {
      b <- 0L until 20L
      (t, xs) <- rows.groupBy(_._1).toSeq
    } yield {
      val ms = xs.map(x => (mult(x._3, b), math.round(x._5 * 10000)))
      val nB = ms.map(_._1).sum
      val s4 = ms.map(p => BigInt(p._1) * p._2).sum
      ((t, b), (nB, s4.toString, r6(s4, BigInt(nB))))
    }).toMap
    val got = SparkEntry.queries("q_agg_bootstrap")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(3), r.getDouble(4)))).toMap
    assert(got === expected)
    assert(got.size == expected.size)
    // replicates genuinely resample: not all replicate counts equal
    assert(got.keys.map(_._1).toSeq.distinct.forall { t =>
      got.collect { case ((`t`, _), (n, _, _)) => n }.toSet.size > 1
    })
  }

  test("rank migration matches a literal two-half decile walk") {
    val rows = events()
    val mm = rows.map(_._2).min + rows.map(_._2).max
    def deciles(half: Long): Map[Long, Int] = {
      val us = rows.filter(x => (if (x._2 * 2 < mm) 0L else 1L) == half)
        .groupBy(_._4).map { case (u, xs) => (u, xs.length.toLong) }
      // r18 score-band deciles (the q_agg_lift cut): users tied on a
      // count share min(10, 1 + 10·|strictly more active|/n_half)
      val n = us.size.toLong
      us.map { case (u, c) =>
        val above = us.values.count(_ > c).toLong
        u -> math.min(10L, 1L + above * 10L / n).toInt
      }
    }
    val (early, late) = (deciles(0L), deciles(1L))
    val expected = early.keySet.intersect(late.keySet).toSeq
      .map(u => (early(u).toLong, late(u).toLong))
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val got = SparkEntry.queries("q_agg_rank_migration")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got === expected)
    // migration is real: some user changed decile
    assert(got.exists { case ((a, b), _) => a != b })
  }
}
