package streamline

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming fault-tolerance + session-window semantics the oracle can't
  * see (SURVEY.md §2.9, §4): exactly-once delivery across query
  * restarts via the checkpoint offset log, and gap-based session
  * windows closing under an advancing watermark.
  */
class StreamRecoverySpec extends SparkSuite {

  test("restart from checkpoint is exactly-once (no loss, no dupes)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlCtx.implicits._
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val out = Files.createTempDirectory("graft_out").toString
    val in = MemoryStream[Long]

    def runOnce(): Unit = {
      val q = in.toDF().toDF("v").writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    in.addData(1L to 100L: _*)
    runOnce()
    in.addData(101L to 150L: _*)
    runOnce() // restart: must process ONLY the new offsets
    runOnce() // restart with nothing new: must write nothing
    val vals = spark.read.parquet(out).select($"v".as[Long]).collect()
    assert(vals.length == 150, s"got ${vals.length} rows")
    assert(vals.toSet == (1L to 150L).toSet)
  }

  test("streaming session windows close when the watermark passes") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlCtx.implicits._
    val in = MemoryStream[(java.sql.Timestamp, Long)]
    val name = s"sess_${System.identityHashCode(in)}"
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val q = in.toDF().toDF("ts", "uid")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window($"ts", "30 minutes"), $"uid")
      .agg(count(lit(1)).as("n"))
      .select($"session_window.start".cast("string").as("s"),
        $"session_window.end".cast("string").as("e"), $"uid", $"n")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    // Session A: two events 10 min apart (one merged session);
    // session B: an isolated later event.
    in.addData((ts("2024-03-01 10:00:00"), 1L),
      (ts("2024-03-01 10:10:00"), 1L), (ts("2024-03-01 12:00:00"), 1L))
    q.processAllAvailable()
    // Far-future event advances the watermark past both session ends.
    in.addData((ts("2024-03-01 18:00:00"), 1L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(name)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3)))
    assert(rows.contains(("2024-03-01 10:00:00", "2024-03-01 10:40:00", 2L)),
      rows.mkString("; "))
    assert(rows.contains(("2024-03-01 12:00:00", "2024-03-01 12:30:00", 1L)),
      rows.mkString("; "))
  }
}
