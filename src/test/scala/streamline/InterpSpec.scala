package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_win_interp against a literal per-user walk: dedupe readings,
  * enumerate the 6-hour grid, bracket each grid point by linear scan,
  * and interpolate with exact BigInt rational HALF_UP — no windows, no
  * union trick — so a mis-bracketted frame or an off-by-one grid bound
  * cannot cancel out. */
class InterpSpec extends SparkSuite {

  test("interpolated grid matches a literal bracketing walk") {
    val step = 21600000000L
    val rows = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts", "value").collect()
      .map { r =>
        val ts = r.getTimestamp(2)
        // full microseconds: getTime truncates to ms, getNanos has the
        // fractional second — interpolation weights need exact µs
        val us = (ts.getTime / 1000) * 1000000L + ts.getNanos / 1000
        (r.getLong(0), r.getLong(1), us, math.round(r.getDouble(3) * 10000))
      }
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
      // dedupe per (user, us): keep the min-event_id reading
      val dedup = rs.groupBy(_._3).map { case (us, xs) =>
        us -> xs.minBy(_._2)._4
      }.toSeq.sortBy(_._1)
      val (usMin, usMax) = (dedup.head._1, dedup.last._1)
      val h0 = math.ceil(usMin.toDouble / step).toLong
      val h1 = math.floor(usMax.toDouble / step).toLong
      (h0 to h1).map(_ * step).flatMap { t =>
        val before = dedup.filter(_._1 <= t)
        val after = dedup.filter(_._1 > t)
        // tb comes from the CURRENT-ROW-inclusive frame: a reading
        // exactly at t sorts before the grid row, so only pt > t
        // readings are ahead of it — except the t == reading case,
        // where ta = t and the formula degenerates to va exactly
        if (before.isEmpty || after.isEmpty) None
        else {
          val (ta, va) = before.last
          val (tb, vb) = after.head
          val num = BigInt(va) * (tb - t) + BigInt(vb) * (t - ta)
          val den = BigInt(tb - ta)
          val mag = (BigInt(2000000) * num.abs + den) / (2 * den)
          val v = (if (num < 0) -mag else mag).toDouble / 1e6
          Some((u, t, v))
        }
      }
    }.sortBy(x => (x._1, x._2))
    val got = SparkEntry.queries("q_win_interp")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expected)
    // interpolation is real: grid values differ from every raw reading
    // somewhere, and the grid is non-trivial
    assert(got.length > 100)
    val raw = rows.map(_._4.toDouble).toSet
    assert(got.exists(x => !raw.contains(x._3)))
  }

  test("peaks match a literal three-point walk") {
    val rows = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts", "value").collect()
      .map { r =>
        val ts = r.getTimestamp(2)
        val us = (ts.getTime / 1000) * 1000000L + ts.getNanos / 1000
        (r.getLong(0), r.getLong(1), us, math.round(r.getDouble(3) * 10000))
      }
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
      val ord = rs.sortBy(x => (x._3, x._2))
      (1 until ord.length - 1).flatMap { i =>
        val (pv, v, nv) = (ord(i - 1)._4, ord(i)._4, ord(i + 1)._4)
        val prom = v - math.max(pv, nv)
        if (v > pv && v > nv && prom >= 2000L)
          Some((u, ord(i)._2, v, prom))
        else None
      }
    }.sortBy(x => (x._1, x._2))
    val got = SparkEntry.queries("q_win_peaks")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expected)
    assert(got.nonEmpty && got.forall(_._4 >= 2000L))
  }
}
