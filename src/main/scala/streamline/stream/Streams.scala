package streamline.stream

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import streamline.{Q, Tables}
import streamline.util.Det._

/** §2.9 Structured Streaming — the hybrid batch/stream surface of the
  * reference lineage (Flink 1.x DataStream windows, watermarks, dedup,
  * stream⋈static; SURVEY.md §2.9).
  *
  * Verification model: the streaming pipeline runs for real (file
  * source → incremental execution → sink) with `Trigger.AvailableNow`
  * over the same finite parquet input, and the collected sink table is
  * returned as a batch DataFrame. Because Structured Streaming's
  * unified model guarantees the finite-input streaming result equals
  * the batch result, the DuckDB oracle is the batch-equivalent SQL —
  * exactly the hybrid-engine property this module witnesses.
  *
  * Scale posture: all aggregations are keyed (window × type, user), so
  * state is hash-partitioned across executors; watermarks bound state
  * growth; the stream⋈static join broadcasts the bounded dimension.
  * The memory sink is a test harness artifact — production sinks are
  * files/any Table API sink with checkpointing.
  */
object Streams {

  private val seq = new AtomicInteger(0)

  /** Events as an unbounded source: same pinned schema + ns→µs
    * conversion as the batch reader (Tables.events). */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The file streaming source requires a directory; narrow the listing
    // to the events table with a glob filter.
    spark.readStream
      .schema(Tables.eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** Run a streaming pipeline to completion (AvailableNow) into a
    * memory sink; return the sink contents as a batch DataFrame. */
  def runToTable(spark: SparkSession, base: String, mode: String,
                 stream: DataFrame): DataFrame = {
    val name = s"${base}_${seq.incrementAndGet()}"
    val q = stream.writeStream
      .format("memory").queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** q_stream_tumble — event-time tumbling window aggregate under a
    * watermark. Complete output mode ⇒ the sink holds the full final
    * result (= batch semantics on finite input). */
  private def streamTumble(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val agg = eventsStream(spark, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 day"), $"event_type")
      .agg(dsum("value").as("sum_val"), count(lit(1)).as("n"))
      .select(tsOut($"window.start").as("w_start"), $"event_type",
        $"sum_val", $"n")
    runToTable(spark, "tumble", "complete", agg)
      .orderBy($"w_start", $"event_type")
  }

  private val streamTumbleSql = """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS w_start, event_type,
      CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_val,
      count(*) AS n
    FROM events GROUP BY 1, 2 ORDER BY w_start, event_type"""

  /** q_stream_slide — sliding window (1 day / 6 h): each event lands in
    * four overlapping windows. */
  private def streamSlide(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val agg = eventsStream(spark, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 day", "6 hours"))
      .agg(count(lit(1)).as("n"), dsum("value").as("sum_val"))
      .select(tsOut($"window.start").as("w_start"), $"n", $"sum_val")
    runToTable(spark, "slide", "complete", agg)
      .orderBy($"w_start")
  }

  // Oracle: every event belongs to the 4 epoch-aligned 6h-step windows
  // whose start is within (ts-24h, ts]; enumerate them by shifting the
  // event's 6h bucket.
  private val streamSlideSql = """
    WITH b AS (SELECT CAST(to_timestamp(floor(epoch(ts)/21600)*21600)
                 AS TIMESTAMP) AS b6, value FROM events),
    w AS (SELECT b6 - (j * INTERVAL 6 HOUR) AS w_start, value
          FROM b CROSS JOIN (SELECT unnest([0,1,2,3]) AS j))
    SELECT w_start, count(*) AS n,
      CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_val
    FROM w GROUP BY w_start ORDER BY w_start"""

  /** q_stream_session — gap-based session windows (30 min) per user.
    * Batch-mode session_window (the same operator Spark uses in
    * streaming; the streaming/late-data path is exercised by
    * q_stream_late and the unit tests). Times are second-truncated in
    * both engines so the ns/µs mismatch can't split a session. */
  private def streamSession(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sec = date_trunc("second", $"ts")
    Tables.events(spark, dir)
      .groupBy(session_window(sec, "30 minutes").as("sw"), $"user_id")
      .agg(count(lit(1)).as("n"), dsum("value").as("sum_val"))
      .select($"user_id", tsOut($"sw.start").as("s_start"),
        tsOut($"sw.end").as("s_end"), $"n", $"sum_val")
      .orderBy($"user_id", $"s_start")
  }

  private val streamSessionSql = """
    WITH e AS (SELECT user_id, date_trunc('second', ts) AS t, value
               FROM events),
    o AS (SELECT user_id, t, value,
            CASE WHEN lag(t) OVER w IS NULL
                   OR t - lag(t) OVER w > INTERVAL 30 MINUTE
                 THEN 1 ELSE 0 END AS brk
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
    s AS (SELECT user_id, t, value,
            sum(brk) OVER (PARTITION BY user_id ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM o)
    SELECT user_id, min(t) AS s_start,
      max(t) + INTERVAL 30 MINUTE AS s_end, count(*) AS n,
      CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_val
    FROM s GROUP BY user_id, sid ORDER BY user_id, s_start"""

  /** q_stream_dedup — streaming dedup on key under a watermark. Only the
    * dedup keys are emitted, so the result is arrival-order
    * independent. */
  private def streamDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val st = eventsStream(spark, dir)
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("user_id", "event_type")
      .select($"user_id", $"event_type")
    runToTable(spark, "dedup", "append", st)
      .orderBy($"user_id", $"event_type")
  }

  private val streamDedupSql = """
    SELECT DISTINCT user_id, event_type FROM events
    ORDER BY user_id, event_type"""

  /** q_join_stream_static — the hybrid hallmark: unbounded events joined
    * to the bounded customer table (data in motion ⋈ data at rest).
    * The static side is broadcast — no stream-side shuffle. */
  private def joinStreamStatic(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val st = eventsStream(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)),
        $"user_id" === $"c_custkey")
      .select($"event_id", $"user_id", $"c_name", $"c_mktsegment")
    runToTable(spark, "ss_join", "append", st)
      .orderBy($"event_id")
  }

  private val joinStreamStaticSql = """
    SELECT event_id, user_id, c_name, c_mktsegment
    FROM events JOIN customer ON user_id = c_custkey
    ORDER BY event_id"""

  /** q_join_stream_stream — stream ⋈ stream interval join (the Flink
    * DataStream intervalJoin): both sides are unbounded event streams
    * under watermarks, joined on user_id with a two-sided time-range
    * condition. The watermark + range bound is what lets Spark evict
    * join state — the state store never holds more than the 10-minute
    * band per key, which is the property that makes this run forever at
    * scale. Finite input ⇒ result equals the batch interval join, which
    * is the oracle. */
  private def joinStreamStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e1 = eventsStream(spark, dir)
      .select($"event_id".as("id1"), $"user_id", $"ts".as("ts1"))
      .withWatermark("ts1", "10 minutes")
    val e2 = eventsStream(spark, dir)
      .select($"event_id".as("id2"), $"user_id".as("u2"), $"ts".as("ts2"))
      .withWatermark("ts2", "10 minutes")
    val joined = e1.join(e2,
        $"user_id" === $"u2" && $"id1" < $"id2" &&
          $"ts2" >= $"ts1" && $"ts2" <= $"ts1" + expr("INTERVAL 10 MINUTES"))
      .select($"user_id", $"id1", $"id2",
        tsSec($"ts1").as("t1"), tsSec($"ts2").as("t2"))
    runToTable(spark, "ss_interval", "append", joined)
      .orderBy($"user_id", $"id1", $"id2")
  }

  private val joinStreamStreamSql = """
    WITH e AS (SELECT event_id, user_id,
                      date_trunc('microseconds', ts) AS ts FROM events)
    SELECT e1.user_id, e1.event_id AS id1, e2.event_id AS id2,
           date_trunc('second', e1.ts) AS t1,
           date_trunc('second', e2.ts) AS t2
    FROM e e1 JOIN e e2
      ON e1.user_id = e2.user_id AND e1.event_id < e2.event_id
     AND e2.ts >= e1.ts AND e2.ts <= e1.ts + INTERVAL 10 MINUTE
    ORDER BY e1.user_id, id1, id2"""

  val all: Seq[Q] = Seq(
    Q("q_stream_tumble", streamTumble _, streamTumbleSql),
    Q("q_join_stream_stream", joinStreamStream _, joinStreamStreamSql),
    Q("q_stream_slide", streamSlide _, streamSlideSql),
    Q("q_stream_session", streamSession _, streamSessionSql),
    Q("q_stream_dedup", streamDedup _, streamDedupSql),
    Q("q_join_stream_static", joinStreamStatic _, joinStreamStaticSql))
}
