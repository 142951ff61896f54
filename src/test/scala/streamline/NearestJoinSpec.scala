package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_join_nearest against an INDEPENDENT in-JVM brute force — a
  * literal both-ways scan over every (purchase, click) pair of the
  * collected sf0.001 events — so a flipped tiebreak (forward winning
  * an equal-gap tie), an equal-timestamp click misrouted to the
  * forward side, or a lost no-click purchase cannot cancel out. */
class NearestJoinSpec extends SparkSuite {

  private def us(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  test("nearest picks match a literal both-ways scan") {
    val evs = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), us(r.getTimestamp(2)),
        r.getString(3)))
    val expected = evs.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
      val clicks = rs.filter(_._4 == "click").map(x => (x._3, x._2))
      rs.filter(_._4 == "purchase").map { case (_, pid, pus, _) =>
        // backward: latest (us, id) click at or before; fwd: earliest
        // strictly after (equal-ts clicks are backward, gap 0)
        val back = clicks.filter(_._1 <= pus).sorted.lastOption
        val fwd = clicks.filter(_._1 > pus).sorted.headOption
        (back, fwd) match {
          case (Some((bu, bi)), Some((fu, _)))
            if pus - bu <= fu - pus =>
            (u, pid, Some(bi), Some("back"), Some(pus - bu))
          case (Some((bu, bi)), None) =>
            (u, pid, Some(bi), Some("back"), Some(pus - bu))
          case (_, Some((fu, fi))) =>
            (u, pid, Some(fi), Some("fwd"), Some(fu - pus))
          case _ => (u, pid, None, None, None)
        }
      }
    }.sortBy(x => (x._1, x._2))
    val got = SparkEntry.queries("q_join_nearest")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getString(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    assert(got === expected)
    // both directions actually occur, and forward wins only strictly
    assert(got.exists(_._4.contains("back")) &&
      got.exists(_._4.contains("fwd")))
    // every purchase row survives (left-join semantics)
    assert(got.length == evs.count(_._4 == "purchase"))
  }
}
