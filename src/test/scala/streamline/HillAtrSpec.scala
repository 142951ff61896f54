package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins the r17 batch-3 additions against INDEPENDENT in-JVM brute
  * forces over the collected sf0.001 fixtures: a literal top-k
  * ln-side-table walk (q_agg_hill), a literal candle + true-range
  * window walk (q_win_atr), a literal per-user half-presence fold
  * (q_agg_mcnemar), and a literal sorted quartile selection
  * (q_agg_bowley) — so a slipped rank cut, a wrong gap TR, a swapped
  * discordant cell or an off-by-one median cannot cancel against the
  * DuckDB oracle, which shares SQL shape with the queries. */
class HillAtrSpec extends SparkSuite {

  private def r6(num: BigInt, den: BigInt): Double = {
    val mag = (BigInt(2000000) * num.abs + den) / (2 * den)
    (if (num < 0) -mag else mag).toDouble / 1e6
  }

  private def us(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def day(u: Long): Long =
    math.floor(u.toDouble / 86400000000.0).toLong

  test("hill matches a literal top-k ln-side-table walk") {
    val o = Tables.orders(spark, sfDir)
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
    def l4(v: Long): Long = math.round(math.log(v.toDouble) * 10000)
    val expected = o.groupBy(_._1).toSeq.map { case (pri, xs) =>
      val vs = xs.map(_._2).sorted(Ordering[Long].reverse)
      val n = vs.length
      val k = (n + 9) / 10
      val thr = vs(k) // (k+1)-th largest
      val num4 = vs.take(k).map(v => l4(v) - l4(thr)).sum
      (pri, n.toLong, k.toLong, thr, num4,
        r6(BigInt(num4), BigInt(k) * 10000))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_agg_hill")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got === expected)
    // heavy-tail estimates are positive and non-degenerate
    assert(got.forall(_._6 > 0) && got.map(_._6).distinct.size > 1)
  }

  test("atr matches a literal candle + true-range walk") {
    val rows = Tables.events(spark, sfDir)
      .select("event_type", "ts", "event_id", "value").collect()
      .map(r => (r.getString(0), us(r.getTimestamp(1)), r.getLong(2),
        math.round(r.getDouble(3) * 10000)))
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (t, xs) =>
      val candles = xs.groupBy(x => day(x._2)).toSeq.sortBy(_._1)
        .map { case (d, es) =>
          val last = es.minBy(e => (-e._2, -e._3)) // max (us, id)
          (d, es.map(_._4).max, es.map(_._4).min, last._4)
        }
      val trs = candles.zipWithIndex.map { case ((d, h, l, _), i) =>
        if (i == 0) (d, h - l)
        else {
          val pc = candles(i - 1)._4
          (d, math.max(h - l, math.max(math.abs(h - pc),
            math.abs(l - pc))))
        }
      }
      (14 until trs.length).map { i =>
        val str = (i - 13 to i).map(j => BigInt(trs(j)._2)).sum
        (t, trs(i)._1, trs(i)._2, r6(str, BigInt(14)))
      }
    }.sortBy(p => (p._1, p._2))
    val got = SparkEntry.queries("q_win_atr")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === expected)
    assert(got.nonEmpty && got.map(_._4).distinct.size > 1)
  }

  test("mcnemar matches a literal per-user day-presence fold") {
    val rows = Tables.events(spark, sfDir)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1),
        day(us(r.getTimestamp(2)))))
    val (lo, hi) = (rows.map(_._3).min, rows.map(_._3).max)
    val flags = rows.groupBy(_._1).toSeq.map { case (_, xs) =>
      (xs.exists(x => x._2 == "purchase" && x._3 == lo),
        xs.exists(x => x._2 == "purchase" && x._3 == hi))
    }
    val b = flags.count(f => f._1 && !f._2).toLong
    val c = flags.count(f => !f._1 && f._2).toLong
    val expected = (flags.size.toLong,
      flags.count(f => f._1 && f._2).toLong, b, c,
      if (b + c == 0) None
      else Some(r6(BigInt(b - c) * BigInt(b - c), BigInt(b + c))))
    val r = SparkEntry.queries("q_agg_mcnemar")(spark, sfDir)
      .collect().head
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) None else Some(r.getDouble(4)))
    assert(got === expected)
    // discordant pairs exist on the fixture: the test is defined
    assert(b + c > 0)
  }

  test("bowley matches a literal sorted quartile selection") {
    val rows = Tables.events(spark, sfDir)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 10000)))
    val expected = rows.groupBy(_._1).toSeq.map { case (t, xs) =>
      val vs = xs.map(_._2).sorted
      val n = vs.length
      val kQ = (n + 3) / 4
      val kM = (n + 1) / 2
      val (q1, q2, q3) = (vs(kQ - 1), vs(kM - 1), vs(n - kQ))
      (t, n.toLong, q1, q2, q3,
        if (q3 == q1) None
        else Some(r6(BigInt(q3) + q1 - 2 * q2, BigInt(q3) - q1)))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_agg_bowley")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toSeq
    assert(got === expected)
    // quartile skew is bounded and the fixture is genuinely skewed
    assert(got.flatMap(_._6).forall(v => v >= -1.0 && v <= 1.0))
    assert(got.flatMap(_._6).exists(v => math.abs(v) > 0.05))
  }
}
