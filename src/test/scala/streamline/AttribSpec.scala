package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_win_attrib against an INDEPENDENT in-JVM brute force over
  * the collected sf0.001 events — a literal per-user timeline walk
  * carrying the latest prior click — so a frame that includes the
  * current row (a click-and-purchase same-row self-attribution), a
  * lookback off-by-one, or a day-boundary error cannot cancel out. */
class AttribSpec extends SparkSuite {

  private def r6(num: BigInt, den: BigInt): Double =
    ((BigInt(2000000) * num + den) / (2 * den)).toDouble / 1000000.0

  test("attribution shares match a literal per-user timeline walk") {
    val evs = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts", "event_type").collect()
      .map { r =>
        val t = r.getTimestamp(2)
        val us = math.floorDiv(t.getTime, 1000L) * 1000000L +
          t.getNanos / 1000L
        (r.getLong(0), r.getLong(1), us, r.getString(3))
      }
    val purch = evs.groupBy(_._1).values.flatMap { rs =>
      var lastClick = Long.MinValue
      rs.sortBy(x => (x._3, x._2)).flatMap { case (_, _, us, typ) =>
        val out = if (typ == "purchase") {
          val attr = lastClick != Long.MinValue &&
            us - lastClick <= 604800000000L
          Some((math.floor(us.toDouble / 86400000000.0).toLong,
            if (attr) 1L else 0L))
        } else None
        if (typ == "click") lastClick = us
        out
      }
    }.toSeq
    val expected = purch.groupBy(_._1).toSeq.map { case (d, xs) =>
      val n = xs.length.toLong; val a = xs.map(_._2).sum
      (d, n, a, r6(BigInt(a), BigInt(n)))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_win_attrib")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === expected)
    // non-degenerate: attribution neither absent nor total
    assert(got.exists(_._3 > 0) && got.exists(x => x._3 < x._2))
  }
}
