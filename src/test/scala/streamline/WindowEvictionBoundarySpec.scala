package streamline

import java.sql.Timestamp

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins the append-mode window emission boundary the closed-window
  * oracles (q_stream_tumble / q_stream_slide / q_stream_session) depend
  * on: a window whose end is EXACTLY equal to the watermark is emitted
  * — Spark's eviction predicate is `window.end <= watermark`
  * (WatermarkSupport.watermarkExpression builds LessThanOrEqual). The
  * oracles mirror this with `<=`.
  */
class WindowEvictionBoundarySpec extends SparkSuite {

  test("a window ending exactly at the watermark is emitted (<=)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val name = s"evict_pin_${System.identityHashCode(input)}"
    val agg = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "0 seconds")
      .groupBy(window($"ts", "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select($"window.start".cast("string").as("w_start"), $"n")
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    def ts(t: String) = Timestamp.valueOf(t)
    // Window [10:00, 11:00) gets one row; the 11:00:00.000 anchor makes
    // the watermark exactly 11:00:00.000 = the window end.
    input.addData((ts("2024-03-01 10:15:00"), 1L),
      (ts("2024-03-01 11:00:00"), 2L))
    q.processAllAvailable()
    // One more batch so the advanced watermark is applied to state.
    input.addData((ts("2024-03-01 11:00:00"), 3L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table(name).as[(String, Long)].collect().toMap
    assert(out.get("2024-03-01 10:00:00").contains(1L),
      s"window ending exactly at the watermark must emit (<=): $out")
    assert(!out.contains("2024-03-01 11:00:00"),
      s"still-open window must not emit: $out")
  }
}
