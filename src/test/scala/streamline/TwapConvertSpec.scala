package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_win_twap and q_agg_convert_latency against INDEPENDENT
  * in-JVM brute forces over the collected sf0.001 events — a literal
  * segment walk with BigInt weights and a literal first-event/median
  * walk — so a hold-to-NEXT vs hold-to-PREVIOUS weighting flip, a
  * dropped zero segment, or a convert-before-signup miscount cannot
  * cancel out. */
class TwapConvertSpec extends SparkSuite {

  private def r6(num: BigInt, den: BigInt): Double =
    ((BigInt(2000000) * num + den) / (2 * den)).toDouble / 1000000.0

  private def us(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  test("twap matches a literal hold-until-next segment walk") {
    val evs = Tables.events(spark, sfDir)
      .select("event_type", "ts", "event_id", "value").collect()
      .map(r => (r.getString(0), us(r.getTimestamp(1)), r.getLong(2),
        math.round(r.getDouble(3) * 10000)))
    val expected = evs.groupBy(x =>
        (x._1, math.floor(x._2.toDouble / 86400000000.0).toLong)).toSeq
      .map { case ((t, d), xs) =>
        val ord = xs.sortBy(x => (x._2, x._3))
        val end = ord.map(_._2).max
        val segs = ord.zipWithIndex.map { case ((_, u, _, v), i) =>
          val next = if (i + 1 < ord.length) ord(i + 1)._2 else end
          (v, next - u)
        }.filter(_._2 > 0)
        val num = segs.map { case (v, dt) => BigInt(v) * dt }.sum
        val den = segs.map(_._2).sum
        (t, d, segs.length.toLong, den, r6(num, BigInt(den)))
      }.sortBy(x => (x._1, x._2))
    val got = SparkEntry.queries("q_win_twap")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got === expected)
    // time-weighting matters: some day's twap differs from its
    // unweighted mean (pinning that dt really enters the average)
    val plain = evs.groupBy(x =>
        (x._1, math.floor(x._2.toDouble / 86400000000.0).toLong))
      .map { case (k, xs) => k -> xs.map(_._4).sum.toDouble / xs.length }
    assert(got.exists { case (t, d, _, _, tw) =>
      math.abs(tw - plain((t, d))) > 1.0 })
  }

  test("conversion latency matches a literal first-event walk") {
    val evs = Tables.events(spark, sfDir)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), us(r.getTimestamp(2))))
    val perUser = evs.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      val s = rs.filter(_._2 == "signup").map(_._3).sorted.headOption
      val p = rs.filter(_._2 == "purchase").map(_._3).sorted.headOption
      s.map(su => (math.floor(su.toDouble / 604800000000.0).toLong,
        p.map(_ - su)))
    }
    val expected = perUser.groupBy(_._1).toSeq.map { case (wk, xs) =>
      val lats = xs.flatMap(_._2).filter(_ >= 0).sorted
      val n = xs.length.toLong; val c = lats.length.toLong
      val med: Any =
        if (c > 0) lats(((c + 1) / 2).toInt - 1) else null
      (wk, n, c, med, r6(BigInt(c), BigInt(n)))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_agg_convert_latency")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3), r.getDouble(4))).toSeq
    assert(got === expected)
    // non-degenerate: some cohort converts partially, none fully
    assert(got.exists(x => x._3 > 0 && x._3 < x._2))
  }
}
