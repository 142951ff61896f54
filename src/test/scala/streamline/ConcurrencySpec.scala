package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_win_concurrency against an INDEPENDENT O(n²) interval
  * STABBING count over the collected sf0.001 events: concurrency after
  * the boundary block at time t is, by the half-open semantics,
  * exactly #{i : startᵢ ≤ t ∧ endᵢ > t} — counted literally per
  * boundary, no sweep, no running sum — so a wrong tie order (+1
  * before −1), a peer-exclusive frame, or a mis-attributed day cannot
  * cancel out. */
class ConcurrencySpec extends SparkSuite {

  test("per-day peaks match an interval-stabbing brute force") {
    import org.apache.spark.sql.functions._
    val sessionUs = 5L * 60 * 1000000
    val dayUs = 86400L * 1000000
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")).as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (et, rs) =>
      val starts = rs.map(_._2)
      val bounds = starts.map(t => (t, true)) ++
        starts.map(t => (t + sessionUs, false))
      def conc(t: Long): Int =
        starts.count(s => s <= t && s + sessionUs > t)
      bounds.groupBy { case (t, _) => t / dayUs }.toSeq.map {
        case (day, bs) =>
          ((et, day), (bs.map(b => conc(b._1)).max.toLong, bs.size.toLong))
      }
    }.toMap
    val got = SparkEntry.queries("q_win_concurrency")(spark, sfDir)
      .collect().map { r =>
        val day = r.getAs[java.time.LocalDateTime](1)
          .toLocalDate.toEpochDay * 86400L * 1000000 / dayUs
        ((r.getString(0), day), (r.getLong(2), r.getLong(3)))
      }.toMap
    assert(got === expected)
    // the profile must discriminate (not a constant-1 degenerate)
    assert(got.values.map(_._1).toSet.size > 1)
  }
}
