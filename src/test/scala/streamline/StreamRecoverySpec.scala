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

  test("recovery composes: two restarts, then a rescale via offline rewrite") {
    // Round-11 double-failure witness (round-10 verdict, item 6): the
    // same windowed aggregation is killed and restarted TWICE —
    // restart 1 on the original checkpoint with a DIFFERENT
    // maxFilesPerTrigger and session partition conf (the checkpointed
    // state layout must win), then the offline statestore-read rewrite
    // migrates the surviving state to 5 partitions and restart 2
    // continues on the rewritten checkpoint. Final output must equal
    // the uninterrupted batch reference with nothing lost, duplicated,
    // or mis-bucketed.
    val sparkI = graft.SparkTestBase.spark
    import sparkI.implicits._
    import streamline.util.Det._
    val root = Files.createTempDirectory("graft_double").toString
    val (stage1, ck1) = (s"$root/in1", s"$root/ck1")
    val (stage2, ck2, out) = (s"$root/in2", s"$root/ck2", s"$root/out")
    val events = Tables.events(spark, sfDir)
    val b = events.agg(min($"ts"), max($"ts")).head()
    val (t0, t1) = (b.getTimestamp(0).getTime, b.getTimestamp(1).getTime)
    val cutA = new java.sql.Timestamp(t0 + (t1 - t0) / 3)
    val cutB = new java.sql.Timestamp(t0 + 2 * (t1 - t0) / 3)
    val carrierSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DecimalType(28, 4)),
      org.apache.spark.sql.types.StructField("cnt",
        org.apache.spark.sql.types.LongType)))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def drain(stage: String, ckpt: String, parts: Int, mft: Int,
              schema: org.apache.spark.sql.types.StructType,
              nExpr: org.apache.spark.sql.Column): Long = {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", mft.toString)
        .parquet(stage)
        .withWatermark("ts", "10 minutes")
        .groupBy(window($"ts", "1 day"), $"event_type")
        .agg(dsum("value").as("sum_val"), nExpr.as("n"))
        .select($"window.start".cast("timestamp_ntz").as("w_start"),
          $"event_type", $"sum_val", $"n")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          df.write.mode("append").parquet(out): Unit
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      q.recentProgress.toSeq
        .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
        .map(_.numShufflePartitions).maxOption.getOrElse(0L)
    }
    try {
      events.where($"ts" < lit(cutA)).repartition(2).write.parquet(stage1)
      val p1 = drain(stage1, ck1, 2, 1, events.schema, count(lit(1)))
      // restart 1: new trigger size AND new session conf — checkpoint wins
      events.where($"ts" >= lit(cutA) && $"ts" < lit(cutB))
        .repartition(2).write.mode("append").parquet(stage1)
      val p2 = drain(stage1, ck1, 7, 2, events.schema, count(lit(1)))
      assert(p1 == 2L && p2 == 2L,
        s"checkpointed layout must win across restarts ($p1, $p2)")
      // offline rewrite: surviving state -> carriers -> 5 partitions
      val carriers = spark.read.format("statestore").load(ck1)
        .select($"key.window.start".as("ts"),
          $"key.event_type".as("event_type"),
          $"value.sum".cast("decimal(28,4)").as("value"),
          $"value.count".as("cnt"))
      carriers.coalesce(1).write.parquet(stage2)
      val p3 = drain(stage2, ck2, 5, 1, carrierSchema, sum($"cnt"))
      // restart 2, on the REWRITTEN checkpoint, different trigger again
      events.where($"ts" >= lit(cutB))
        .select($"ts", $"event_type",
          $"value".cast("decimal(28,4)").as("value"), lit(1L).as("cnt"))
        .repartition(2).write.mode("append").parquet(stage2)
      val p4 = drain(stage2, ck2, 5, 3, carrierSchema, sum($"cnt"))
      assert(p3 == 5L && p4 == 5L,
        s"rewritten state must run at the new partition count ($p3, $p4)")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    val res = spark.read.parquet(out)
    assert(res.groupBy("w_start", "event_type").count()
      .where(col("count") > 1).count() == 0L,
      "a closed window was emitted more than once across the three runs")
    // uninterrupted batch reference under the same closed-window bound
    val wmMs = t1 - 600000L
    val ref = events
      .withColumn("w_start", date_trunc("day", $"ts").cast("timestamp_ntz"))
      .groupBy($"w_start", $"event_type")
      .agg(dsum("value").as("sum_val"), count(lit(1)).as("n"))
      .where(unix_timestamp($"w_start".cast("timestamp")) * 1000L +
        86400000L <= wmMs)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"w_start".cast("string"), $"event_type", $"sum_val", $"n")
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getDouble(2), r.getLong(3))).sortBy(t => (t._1, t._2)).toSeq
    assert(rows(res) == rows(ref),
      s"${res.count()} emitted vs ${ref.count()} reference windows")
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
