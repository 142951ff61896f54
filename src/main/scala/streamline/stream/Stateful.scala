package streamline.stream

import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import streamline.Q

/** §2.9 keyed state + timers surface — the Flink KeyedProcessFunction /
  * ValueState equivalent: `flatMapGroupsWithState` with a typed
  * `GroupState` (SURVEY.md §2.9).
  *
  * Determinism: per-key state keeps an exact BigDecimal sum with each
  * input quantized like `CAST(x AS DECIMAL(18,4))`, so neither arrival
  * order nor batch boundaries can change the emitted totals; the final
  * row per key is selected by the monotone event counter, so the query
  * is correct even if AvailableNow splits the input into several
  * micro-batches (each key's updates strictly increase in n_events).
  */
object Stateful {

  case class EvRow(user_id: Long, value: Double)
  case class UState(n: Long, sum: BigDecimal)
  case class UOut(user_id: Long, n_events: Long, sum_val: Double)

  private def dec4(v: Double): BigDecimal =
    BigDecimal(v).setScale(4, RoundingMode.HALF_UP)

  private def updateUser(uid: Long, rows: Iterator[EvRow],
                         state: GroupState[UState]): Iterator[UOut] = {
    val prev = state.getOption.getOrElse(UState(0L, BigDecimal(0)))
    var n = prev.n
    var sum = prev.sum
    rows.foreach { r => n += 1; sum += dec4(r.value) }
    state.update(UState(n, sum))
    Iterator(UOut(uid, n, sum.toDouble))
  }

  /** q_stream_stateful — running per-key aggregate in keyed state,
    * emitted as updates; the final (max-counter) update per key is the
    * answer. */
  private def streamStateful(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val updates = Streams.eventsStream(spark, dir)
      .select($"user_id", $"value").as[EvRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(updateUser)
      .toDF()
    val collected = Streams.runToTable(spark, "stateful", "update", updates)
    val w = Window.partitionBy($"user_id").orderBy($"n_events".desc)
    collected
      .withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"user_id", $"n_events", $"sum_val")
      .orderBy($"user_id")
  }

  private val streamStatefulSql = """
    SELECT user_id, count(*) AS n_events,
      CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_val
    FROM events GROUP BY user_id ORDER BY user_id"""

  /** q_stream_late — watermark semantics witness: a two-batch
    * MemoryStream where the second batch carries an event far behind
    * the watermark; the late row must NOT appear in the windowed
    * counts. Not SQL-expressible ⇒ declared without oracle; also
    * asserted in unit tests. */
  private def streamLate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val name = s"late_${System.identityHashCode(input)}"
    val agg = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select($"window.start".cast("timestamp_ntz").as("w_start"), $"n")
    // Few-row witness: 4 state-store partitions, not the session default
    // (round 1 paid 14 s of per-partition fixed cost for 4 rows).
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      // Batch 1: three on-time events; advances the watermark to 11:50.
      input.addData((ts("2024-03-01 10:15:00"), 1L),
        (ts("2024-03-01 11:10:00"), 2L), (ts("2024-03-01 12:00:00"), 3L))
      q.processAllAvailable()
      // Batch 2: one event at 09:30 — 2h20m behind the watermark → dropped.
      input.addData((ts("2024-03-01 09:30:00"), 9L))
      q.processAllAvailable()
      q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(name)
      .groupBy($"w_start").agg(max($"n").as("n"))
      .orderBy($"w_start")
  }

  case class ToRow(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class ToState(n: Long, sum: BigDecimal, last_ms: Long)
  case class ToOut(user_id: Long, n_events: Long, sum_val: Double)

  private val idleGapMs = 30L * 60 * 1000

  /** Keyed-state timer callback — the Flink KeyedProcessFunction
    * `registerEventTimeTimer`/`onTimer` surface: accumulate per-key
    * totals silently, arm an event-time timer at (last event + 30 min),
    * and emit the key's aggregate only when the watermark passes the
    * timer (idle-key flush). On timeout the state is removed, so a key
    * holds state only while active + one idle gap — the TTL property
    * that keeps per-key state usable on an unbounded stream. */
  private def updateTimeout(uid: Long, rows: Iterator[ToRow],
                            state: GroupState[ToState]): Iterator[ToOut] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(ToOut(uid, s.n, s.sum.toDouble))
    } else {
      val prev = state.getOption.getOrElse(ToState(0L, BigDecimal(0), 0L))
      var n = prev.n
      var sum = prev.sum
      var last = prev.last_ms
      // Timestamp.getTime floors µs→ms exactly like the watermark's
      // EventTimeStats, so the armed timer is ms-aligned with the
      // oracle's date_trunc('millisecond', ...).
      rows.foreach { r =>
        n += 1; sum += dec4(r.value); last = math.max(last, r.ts.getTime)
      }
      state.update(ToState(n, sum, last))
      state.setTimeoutTimestamp(last + idleGapMs)
      Iterator.empty
    }
  }

  /** q_stream_timeout — event-time timers flushing idle keys
    * (GroupStateTimeout.EventTimeTimeout). Deterministic oracle: with
    * the finite input processed as one batch, the final watermark is
    * floor_ms(max(ts)) − 10 min and a key fires iff its timer
    * (floor_ms(key max ts) + 30 min) is strictly below it — Spark's
    * timeout check is `timeoutTimestamp < watermark`
    * (FlatMapGroupsWithStateExec.processTimedOutState; pinned by
    * TimeoutBoundarySpec). */
  private def streamTimeout(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val updates = Streams.eventsStream(spark, dir)
      .withWatermark("ts", "10 minutes")
      .select($"user_id", $"ts", $"value")
      .as[ToRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(updateTimeout)
      .toDF()
    Streams.runToTable(spark, "timeout", "append", updates)
      .orderBy($"user_id")
  }

  private val streamTimeoutSql = """
    WITH wm AS (SELECT date_trunc('millisecond', max(ts))
                  - INTERVAL 10 MINUTE AS w FROM events)
    SELECT user_id, count(*) AS n_events,
      CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_val
    FROM events GROUP BY user_id
    HAVING date_trunc('millisecond', max(ts)) + INTERVAL 30 MINUTE
             < (SELECT w FROM wm)
    ORDER BY user_id"""

  case class CwRow(user_id: Long, ts: Long, event_id: Long, value: Double)
  case class CwState(buf: List[CwRow], nextWin: Long)
  case class CwOut(user_id: Long, win_id: Long, n: Long, sum_val: Double)

  private val winSize = 5

  /** Per-key count-window fire: buffer rows, emit one aggregate per
    * COMPLETE window of `winSize` events in (ts, event_id) order —
    * Flink's `countWindow(n)` semantics (trailing partial windows never
    * fire). Rows within a batch are sorted before windowing so the
    * result is scan-order independent. */
  private def updateCw(uid: Long, rows: Iterator[CwRow],
                       state: GroupState[CwState]): Iterator[CwOut] = {
    val prev = state.getOption.getOrElse(CwState(Nil, 0L))
    val all = (prev.buf ++ rows.toList).sortBy(r => (r.ts, r.event_id))
    val (complete, rest) = all.splitAt(all.length - all.length % winSize)
    val outs = complete.grouped(winSize).zipWithIndex.map { case (w, i) =>
      val sum = w.foldLeft(BigDecimal(0))((a, r) => a + dec4(r.value))
      CwOut(uid, prev.nextWin + i, winSize.toLong, sum.toDouble)
    }.toList
    state.update(CwState(rest, prev.nextWin + outs.length))
    outs.iterator
  }

  /** q_stream_count_window — Flink `DataStream.countWindow(5)`: a window
    * type Spark has no built-in for, composed from keyed state
    * (`flatMapGroupsWithState`). State holds only the open (partial)
    * window per key — bounded by winSize rows per key at any moment, so
    * it scales like any keyed state op. Oracle: complete windows of the
    * (ts, event_id)-ordered per-key sequence via row_number arithmetic. */
  private def streamCountWindow(spark: SparkSession,
                                dir: String): DataFrame = {
    import spark.implicits._
    val updates = Streams.eventsStream(spark, dir)
      .select($"user_id", unix_micros($"ts").as("ts"), $"event_id", $"value")
      .as[CwRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(updateCw)
      .toDF()
    Streams.runToTable(spark, "cw", "append", updates)
      .orderBy($"user_id", $"win_id")
  }

  private val streamCountWindowSql = """
    WITH e AS (SELECT user_id, value, event_id,
                 date_trunc('microseconds', ts) AS tsu FROM events),
    o AS (SELECT user_id, value,
            row_number() OVER (PARTITION BY user_id
              ORDER BY tsu, event_id) - 1 AS rn,
            count(*) OVER (PARTITION BY user_id) AS total
          FROM e)
    SELECT user_id, rn // 5 AS win_id, count(*) AS n,
      CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_val
    FROM o WHERE rn < total - (total % 5)
    GROUP BY user_id, rn // 5
    ORDER BY user_id, win_id"""

  val all: Seq[Q] = Seq(
    Q("q_stream_stateful", streamStateful _, streamStatefulSql),
    Q("q_stream_count_window", streamCountWindow _, streamCountWindowSql),
    Q("q_stream_timeout", streamTimeout _, streamTimeoutSql),
    Q.noOracle("q_stream_late", streamLate _))
}
