package streamline

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Pins the two properties q_stream_backpressure claims:
  *
  *  1. `maxFilesPerTrigger=1` under `Trigger.AvailableNow` really
  *     slices the backlog into one micro-batch per file (the legacy
  *     Trigger.Once would collapse it into one batch) — witnessed by
  *     one update-mode firing per file for a key present in every file.
  *  2. The declared query's final-per-key selection equals the plain
  *     batch aggregate.
  */
class BackpressureSpec extends SparkSuite {

  test("one micro-batch per file under maxFilesPerTrigger=1") {
    val s = spark
    import s.implicits._
    val tmp = streamline.util.Scratch.dir("bp_spec", "unit")
    // 3 single-row files of the same key => 3 files in the backlog
    (1 to 3).foreach { i =>
      Seq(("k", i)).toDF("k", "v")
        .write.mode(if (i == 1) "overwrite" else "append")
        .parquet(tmp)
    }
    val src = s.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "k STRING, v INT"))
      .option("maxFilesPerTrigger", "1").parquet(tmp)
    val name = s"bp_spec_${System.nanoTime()}"
    val q = src.groupBy($"k").agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation",
        s"${streamline.util.Knobs.fastTmp}/ck_$name")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // one firing per micro-batch => n = 1, 2, 3 each emitted once
    val fired = s.table(name).as[(String, Long)].collect().toSet
    assert(fired == Set(("k", 1L), ("k", 2L), ("k", 3L)),
      s"expected 3 incremental firings, got $fired")
    stream.Streams.deleteRec(new java.io.File(
      s"${streamline.util.Knobs.fastTmp}/ck_$name"))
  }

  test("declared query equals the batch aggregate") {
    val s = spark
    import s.implicits._
    val got = SparkEntry.queries("q_stream_backpressure")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = Tables.events(spark, sfDir)
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .orderBy($"event_type")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
  }
}
