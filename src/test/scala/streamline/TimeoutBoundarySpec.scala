package streamline

import java.sql.Timestamp

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Pins the event-time-timeout comparison semantics that
  * q_stream_timeout's oracle depends on: a timer armed at exactly the
  * final watermark must NOT fire (Spark checks
  * `timeoutTimestamp < watermark`, strictly), while a timer strictly
  * below it must. The oracle SQL mirrors this with a strict `<`.
  */
class TimeoutBoundarySpec extends SparkSuite {

  import TimeoutBoundarySpec._

  test("event-time timeout fires strictly below the watermark, not at it") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val name = s"to_pin_${System.identityHashCode(input)}"
    val flushed = input.toDS().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .as[(Timestamp, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fireOnTimeout)
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
    // Batch 2 carries the advanced watermark; timers are evaluated here.
    input.addData((ts("2024-03-01 10:40:00"), "anchor"))
    q.processAllAvailable()
    q.stop()
    val fired = spark.table(name).as[String].collect().toSet
    assert(fired.contains("belowWm"), s"strictly-below timer must fire: $fired")
    assert(!fired.contains("atWm"),
      s"timer at exactly the watermark must NOT fire (strict <): $fired")
  }
}

object TimeoutBoundarySpec {
  private val gapMs = 30L * 60 * 1000

  def fireOnTimeout(key: String, rows: Iterator[(Timestamp, String)],
                    state: GroupState[Long]): Iterator[String] = {
    if (state.hasTimedOut) { state.remove(); Iterator(key) }
    else {
      val last = (state.getOption.toList ++
        rows.map(_._1.getTime).toList).max
      state.update(last)
      state.setTimeoutTimestamp(last + gapMs)
      Iterator.empty
    }
  }
}
