package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_win_streak and q_win_drawdown against INDEPENDENT in-JVM
  * brute forces over the collected sf0.001 events — literal walks of
  * sorted days, no window algebra — so a wrong island key, an
  * off-by-one datediff, a peers-included frame or a mis-scoped running
  * max cannot cancel out. */
class StreakDrawdownSpec extends SparkSuite {

  private def day(t: java.sql.Timestamp): Long =
    t.getTime / 86400000L // UTC epoch day; fixture days never pre-1970

  test("streaks match a sorted-walk run-length brute force") {
    val rows = Tables.events(spark, sfDir)
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), day(r.getTimestamp(1))))
    val expected = rows.groupBy(_._1).map { case (u, rs) =>
      val days = rs.map(_._2).distinct.sorted
      // literal run-length walk of consecutive days
      val runs = scala.collection.mutable.ListBuffer.empty[Long]
      var cur = 0L
      var prev = Long.MinValue
      days.foreach { d =>
        if (d == prev + 1) cur += 1
        else { if (cur > 0) runs += cur; cur = 1 }
        prev = d
      }
      runs += cur
      u -> ((runs.max, days.length.toLong, runs.length.toLong))
    }
    val got = SparkEntry.queries("q_win_streak")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === expected)
    // discriminating: streaks of more than one length occur
    assert(got.values.map(_._1).toSet.size > 1)
  }

  test("max drawdown matches a literal peak-walk over daily deltas") {
    val rows = Tables.events(spark, sfDir)
      .select("event_type", "ts", "user_id").collect()
      .map(r => (r.getString(0), day(r.getTimestamp(1)), r.getLong(2) % 2))
    val expected = rows.groupBy(_._1).map { case (et, rs) =>
      val deltas = rs.groupBy(_._2).toSeq.sortBy(_._1).map { case (_, ds) =>
        ds.count(_._3 == 0L).toLong - ds.count(_._3 == 1L).toLong
      }
      var cum = 0L; var peak = Long.MinValue
      var maxDd = Long.MinValue; var atPeak = 0L
      deltas.foreach { d =>
        cum += d
        peak = math.max(peak, cum)
        maxDd = math.max(maxDd, peak - cum)
        if (cum == peak) atPeak += 1
      }
      et -> ((maxDd, peak, deltas.length.toLong, atPeak))
    }
    val got = SparkEntry.queries("q_win_drawdown")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === expected)
    // the walk must actually draw down somewhere
    assert(got.values.exists(_._1 > 0))
  }
}
