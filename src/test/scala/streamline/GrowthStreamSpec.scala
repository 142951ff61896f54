package streamline

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** Pins q_stream_growth_accounting's batching-invariance contract: the
  * incremental drain over a DIFFERENT time-ordered sharding (2 shards
  * by day-half instead of the query's 4 day-quartiles) must produce
  * EXACTLY the batch q_agg_growth_accounting table — the verdicts are
  * final at first sighting only because staging is day-ordered, so
  * this is the property the shared oracle rests on (the
  * q_stream_dedup_incremental invariance discipline). Also pins that
  * a verdict actually lands in more than one micro-batch (the stream
  * genuinely classifies incrementally, not in one shot). */
class GrowthStreamSpec extends SparkSuite {

  test("2-shard drain equals the batch growth-accounting table") {
    val act = Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase")
      .select(col("user_id"),
        floor(unix_micros(col("ts")).cast("double") / lit(86400000000.0))
          .cast("long").as("day"))
    val b = act.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .head()
    val (lo, span) = (b.getLong(0), b.getLong(1) - b.getLong(0) + 1)
    val stage = streamline.util.Scratch.dir("growthacc_spec", sfDir) +
      "/in2"
    streamline.stream.Streams.deleteRec(
      new java.io.File(stage).getParentFile)
    // two sequential single-file writes, one day-HALF each
    for (i <- 0L until 2L)
      act.where(call_function("div", (col("day") - lit(lo)) * lit(2L),
          lit(span)) === lit(i))
        .coalesce(1).write.mode("append").parquet(stage)
    val streamed = streamline.batch.Aggregates
      .streamGrowthDrain(spark, stage).orderBy(col("day")).collect()
    val batch = SparkEntry.queries("q_agg_growth_accounting")(
      spark, sfDir).collect()
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
    // the drain really spans batches: activity exists in BOTH halves
    val perShard = (0L until 2L).map(i => act.where(
      call_function("div", (col("day") - lit(lo)) * lit(2L), lit(span))
        === lit(i)).count())
    assert(perShard.forall(_ > 0L))
  }
}
