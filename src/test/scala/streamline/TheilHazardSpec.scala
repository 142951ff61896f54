package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins the r17 batch-2 lifecycle aggregates against independent
  * in-JVM brute forces over collected sf0.001 fixtures: a literal
  * Theil re-derivation with the ln-side-table boundary pin (the
  * PsiSpec discipline), a literal per-user week-by-week at-risk walk
  * (q_agg_hazard), and a literal first-week classification
  * (q_agg_new_returning). */
class TheilHazardSpec extends SparkSuite {

  private def r6(num: BigInt, den: BigInt): Double = {
    val mag = (BigInt(2000000) * num.abs + den) / (2 * den)
    (if (num < 0) -mag else mag).toDouble / 1e6
  }

  private def us(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  test("Theil matches a literal re-derivation; L4 inputs boundary-safe") {
    val ords = Tables.orders(spark, sfDir).select("o_custkey").collect()
      .map(_.getLong(0))
    val nat = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val x = ords.groupBy(identity).map { case (c, xs) =>
      (nat(c).toLong, c) -> xs.length.toLong
    }
    val byNk = x.groupBy(_._1._1)
    val vals = byNk.flatMap { case (_, m) =>
      val n = m.size.toLong
      m.values.map(_ * n).toSeq :+ m.values.sum
    }.toSet
    vals.foreach { v =>
      val lx = math.log(v.toDouble) * 10000
      assert(v == 1L || math.abs(lx - math.floor(lx) - 0.5) > 1e-6,
        s"ln($v)*1e4 within 1e-6 of a rounding boundary — oracle unsafe")
    }
    val l4 = vals.map(v =>
      v -> math.round(math.log(v.toDouble) * 10000)).toMap + (1L -> 0L)
    val expected = byNk.toSeq.map { case (nk, m) =>
      val n = m.size.toLong
      val sx = m.values.sum
      val num = m.values.map(xi => xi * (l4(xi * n) - l4(sx))).sum
      (nk, n, sx, num, r6(BigInt(num), BigInt(sx) * 10000))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_agg_theil")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got === expected)
    // inequality is real somewhere: at least one nation has T > 0
    assert(got.exists(_._5 > 0.0))
  }

  test("hazard table matches a literal per-user at-risk walk") {
    val WK = 604800000000L
    val rows = Tables.events(spark, sfDir)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), us(r.getTimestamp(2))))
    val end = rows.map(_._3).max
    val users: Seq[(Option[Long], Long)] =
      rows.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
        val s = xs.filter(_._2 == "signup").map(_._3)
        if (s.isEmpty) None
        else {
          val sUs = s.min
          val p = xs.filter(_._2 == "purchase").map(_._3)
          val ew = if (p.isEmpty || p.min < sUs) None
                   else Some((p.min - sUs) / WK)
          Some((ew, (end - sUs) / WK))
        }
      }
    val maxK = users.map(_._2).max
    val expected = (0L to maxK).flatMap { k =>
      val atRisk = users.count { case (ew, sw) =>
        sw >= k && ew.forall(_ >= k) }
      val ev = users.count { case (ew, sw) => sw >= k && ew.contains(k) }
      if (atRisk > 0)
        Some((k, atRisk.toLong, ev.toLong, r6(BigInt(ev), BigInt(atRisk))))
      else None
    }
    val got = SparkEntry.queries("q_agg_hazard")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === expected)
    // week 0 carries real events and censoring thins the risk set
    assert(got.head._3 > 0 && got.last._2 < got.head._2)
  }

  test("new/returning split matches a literal first-week classify") {
    val WK = 604800000000L
    val rows = Tables.events(spark, sfDir)
      .select("event_type", "user_id", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1), us(r.getTimestamp(2)) / WK))
    val fw = rows.groupBy(x => (x._1, x._2))
      .map { case (k, xs) => k -> xs.map(_._3).min }
    val expected = rows.groupBy(x => (x._1, x._3)).toSeq
      .map { case ((t, wk), xs) =>
        val nNew = xs.count(x => fw((t, x._2)) == wk).toLong
        val n = xs.length.toLong
        (t, wk, n, nNew, n - nNew, r6(BigInt(nNew), BigInt(n)))
      }.sortBy(x => (x._1, x._2))
    val got = SparkEntry.queries("q_agg_new_returning")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got === expected)
    // the split is non-trivial: some week mixes new and returning
    assert(got.exists(x => x._4 > 0 && x._5 > 0))
  }
}
