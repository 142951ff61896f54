package streamline

import java.sql.Timestamp

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Pins the expiry comparison q_stream_tws_timer's oracle depends on —
  * and it is NOT the one flatMapGroupsWithState uses:
  * `transformWithState` drains event-time timers INCLUSIVELY (a timer
  * armed at exactly the watermark fires; `expiryTs <= watermark`),
  * while fmGWS's timeout check is strict `<`
  * (TimeoutBoundarySpec). Discovered by running this spec with the
  * strict-< expectation and watching the at-watermark timer fire; the
  * oracle SQL uses `<=` accordingly. The two operators genuinely
  * differ on the boundary — anyone porting an fmGWS timeout to
  * transformWithState inherits a one-watermark-tick semantic shift.
  */
class TwsTimerBoundarySpec extends SparkSuite {

  import TwsTimerBoundarySpec._

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("tws event-time timer fires AT the watermark too (inclusive <=)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val name = s"twt_pin_${System.identityHashCode(input)}"
    val before = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocks)
    try {
      val flushed = input.toDS().toDF("ts", "k")
        .withWatermark("ts", "10 minutes")
        .as[(Timestamp, String)]
        .groupByKey(_._2)
        .transformWithState(new FireAtTimer,
          TimeMode.EventTime(), OutputMode.Append())
        .toDF()
      val q = flushed.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      def ts(t: String) = Timestamp.valueOf(t)
      // Batch 1. Timers: atWm -> 10:00+30m = 10:30:00.000 (== final
      // watermark exactly); belowWm -> 09:30; anchor only sets the max
      // event time: watermark = 10:40 - 10m = 10:30:00.000.
      input.addData((ts("2024-03-01 10:00:00"), "atWm"),
        (ts("2024-03-01 09:00:00"), "belowWm"),
        (ts("2024-03-01 10:40:00"), "anchor"))
      q.processAllAvailable()
      // Batch 2 carries the advanced watermark; timers drain here.
      input.addData((ts("2024-03-01 10:40:00"), "anchor"))
      q.processAllAvailable()
      q.stop()
      val fired = spark.table(name).as[String].collect().toSet
      assert(fired.contains("belowWm"),
        s"strictly-below timer must fire: $fired")
      assert(fired.contains("atWm"),
        s"tws drains timers inclusively — the at-watermark timer must " +
          s"fire (<=, unlike fmGWS's strict <): $fired")
      assert(!fired.contains("anchor"),
        s"anchor's timer (10:40+30m) is above the watermark: $fired")
    } finally {
      before match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }
}

object TwsTimerBoundarySpec {
  private val gapMs = 30L * 60 * 1000

  class FireAtTimer extends StatefulProcessor[String, (Timestamp, String),
      String] {
    @transient private var last: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[Long]("last",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(Timestamp, String)],
        timers: TimerValues): Iterator[String] = {
      val mx = (Option(if (last.exists()) last.get() else 0L).toList ++
        rows.map(_._1.getTime).toList).max
      last.update(mx)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(mx + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[String] =
      Iterator.single(key)
  }
}
