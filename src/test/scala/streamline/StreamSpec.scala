package streamline

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** Streaming semantics the DuckDB oracle can't see (SURVEY.md §5.2). */
class StreamLateSpec extends SparkSuite {

  test("q_stream_late: the late row is dropped by the watermark") {
    val sparkI = graft.SparkTestBase.spark
    import sparkI.implicits._
    val out = SparkEntry.queries("q_stream_late")(spark, sfDir)
      .select($"w_start".cast("string"), $"n").as[(String, Long)]
      .collect().toMap
    // On-time rows: one per hour window at 10:00 / 11:00 / 12:00.
    assert(out("2024-03-01 10:00:00") == 1L)
    assert(out("2024-03-01 11:00:00") == 1L)
    assert(out("2024-03-01 12:00:00") == 1L)
    // The 09:30 event arrived behind the watermark → no 09:00 window.
    assert(!out.contains("2024-03-01 09:00:00"))
  }

  test("q_stream_late_side captures exactly the dropped late rows") {
    val sparkI = graft.SparkTestBase.spark
    import sparkI.implicits._
    val side = SparkEntry.queries("q_stream_late_side")(spark, sfDir)
      .select($"w_start".cast("string"), $"n_late").as[(String, Long)]
      .collect().toSeq
    // The single 09:30 late event is the entire side output.
    assert(side == Seq(("2024-03-01 09:00:00", 1L)), side.toString)
  }
}

class StreamBatchEquivSpec extends SparkSuite {

  test("streaming tumble equals batch tumble over closed windows") {
    val sparkI = graft.SparkTestBase.spark
    import sparkI.implicits._
    val streamed = SparkEntry.queries("q_stream_tumble")(spark, sfDir)
    // Append mode emits exactly the windows the final watermark closed
    // (end <= floor_ms(max ts) - 10 min); mirror that filter on the
    // batch side.
    val maxMs = Tables.events(spark, sfDir)
      .agg(max(date_trunc("millisecond", $"ts"))).head.getTimestamp(0)
    val cutoff = new java.sql.Timestamp(maxMs.getTime - 10 * 60 * 1000)
    val batch = Tables.events(spark, sfDir)
      .groupBy(window($"ts", "1 day"), $"event_type")
      .agg(sum($"value".cast("decimal(18,4)")).cast("double").as("sum_val"),
        count(lit(1)).as("n"))
      .where($"window.end" <= lit(cutoff))
      .select($"window.start".cast("timestamp_ntz").as("w_start"),
        $"event_type", $"sum_val", $"n")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming dedup equals DISTINCT on finite input") {
    val streamed = SparkEntry.queries("q_stream_dedup")(spark, sfDir)
    val batch = Tables.events(spark, sfDir)
      .select("user_id", "event_type").distinct()
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
