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

  test("q_stream_recovery restarts from checkpoint without double emission") {
    import org.apache.spark.sql.functions._
    // Run the declared query, then audit the RAW foreachBatch output
    // (batch_id-tagged parquet in the scratch dir) that the declared
    // projection drops: the flow must have split work across several
    // micro-batches (two runs, maxFilesPerTrigger=1), and no window key
    // may be emitted by more than one micro-batch — double emission
    // through foreachBatch after restart is exactly the failure this
    // witnesses against.
    val res = graft.SparkEntry.queries("q_stream_recovery")(spark, sfDir)
      .cache()
    val keyed = res.groupBy("w_start", "event_type").count()
    assert(keyed.where(col("count") > 1).count() == 0L,
      "a closed window was emitted more than once")
    // Equality with the batch reference (same closed-window bound).
    val ref = Tables.events(spark, sfDir)
      .withColumn("w_start", date_trunc("day", col("ts")))
      .groupBy("w_start", "event_type")
      .agg(count(lit(1)).as("n"))
      .join(Tables.events(spark, sfDir)
          .agg((max(col("ts")).cast("long") - 600).as("wm")),
        expr("unix_timestamp(w_start) + 86400 <= wm"))
    assert(res.count() == ref.count(),
      s"recovered result has ${res.count()} windows, batch says ${ref.count()}")
    val raw = spark.read.parquet(
      streamline.util.Scratch.dir("recov", sfDir) + "/out")
    assert(raw.select("batch_id").distinct().count() >= 2,
      "expected the emissions to span several micro-batches/runs")
    val overlap = raw.groupBy("w_start", "event_type")
      .agg(countDistinct(col("batch_id")).as("nb"))
      .where(col("nb") > 1).count()
    assert(overlap == 0L, "a window key appears in more than one batch")
    res.unpersist()
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
