package streamline

import java.sql.Timestamp

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream interval-join STATE EVICTION witness: the band
  * condition + watermark must bound the join state store on an
  * unbounded stream. Spark derives the eviction bound ("state value
  * watermark") from the time-range conjuncts of the join condition;
  * StreamingJoinHelper logs a WARN while parsing the non-time
  * `id1 < id2` conjunct, so this spec pins that eviction still happens
  * despite it — if extraction ever regressed to no-eviction, state
  * would grow monotonically and this fails. */
class JoinStateEvictionSpec extends SparkSuite {

  test("interval-join state evicts under watermark despite a non-time conjunct") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in1 = MemoryStream[(Timestamp, Long, Long)]
    val in2 = MemoryStream[(Timestamp, Long, Long)]
    val name = s"join_evict_${System.identityHashCode(in1)}"
    val e1 = in1.toDS().toDF("ts1", "user_id", "id1")
      .withWatermark("ts1", "10 minutes")
    val e2 = in2.toDS().toDF("ts2", "u2", "id2")
      .withWatermark("ts2", "10 minutes")
    val joined = e1.join(e2,
      $"user_id" === $"u2" && $"id1" < $"id2" &&
        $"ts2" >= $"ts1" && $"ts2" <= $"ts1" + expr("INTERVAL 10 MINUTES"))
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    def ts(t: String) = Timestamp.valueOf(t)
    // batch 1: a key at 10:00 on both sides
    in1.addData((ts("2024-03-01 10:00:00"), 1L, 1L))
    in2.addData((ts("2024-03-01 10:01:00"), 1L, 2L))
    q.processAllAvailable()
    // batch 2: jump the watermark far past 10:00 + band
    in1.addData((ts("2024-03-01 14:00:00"), 2L, 10L))
    in2.addData((ts("2024-03-01 14:00:30"), 2L, 11L))
    q.processAllAvailable()
    // batch 3: one more advance so eviction of batch-1 rows lands
    in1.addData((ts("2024-03-01 16:00:00"), 3L, 20L))
    in2.addData((ts("2024-03-01 16:00:30"), 3L, 21L))
    q.processAllAvailable()
    val lastState = q.recentProgress.toSeq
      .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
      .lastOption
    q.stop()
    assert(lastState.nonEmpty, "expected a stateful operator in progress")
    val total = lastState.get.numRowsTotal
    // 6 rows entered; the 10:00/14:00 rows' windows are far below the
    // final watermark — retained state must be the recent rows only
    assert(total < 6, s"join state never evicted: numRowsTotal=$total")
  }

  test("band-only join condition extracts state watermarks without WARN") {
    // The production inner interval joins (q_join_stream_stream,
    // q_stream_join_agg) keep ONLY key + time-band conjuncts in the
    // join condition and apply id1<id2 post-join, so
    // StreamingJoinHelper's constraint solver succeeds on BOTH sides.
    // This pins the absence of the "Cannot evaluate expression" WARN —
    // the partial-extraction failure mode the old shape triggered.
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    import org.apache.logging.log4j.LogManager
    import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.config.Property
    val app = new AbstractAppender(
        "graft-warn-capture", null, null, true, Property.EMPTY_ARRAY) {
      override def append(e: LogEvent): Unit = {
        val thrown = Option(e.getThrown).map(_.toString).getOrElse("")
        captured.add(s"${e.getMessage.getFormattedMessage} | $thrown")
      }
    }
    app.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val root = ctx.getRootLogger
    root.addAppender(app)
    try {
      val in1 = MemoryStream[(Timestamp, Long, Long)]
      val in2 = MemoryStream[(Timestamp, Long, Long)]
      val name = s"join_clean_${System.identityHashCode(in1)}"
      val e1 = in1.toDS().toDF("ts1", "user_id", "id1")
        .withWatermark("ts1", "10 minutes")
      val e2 = in2.toDS().toDF("ts2", "u2", "id2")
        .withWatermark("ts2", "10 minutes")
      val joined = e1.join(e2,
          $"user_id" === $"u2" &&
            $"ts2" >= $"ts1" && $"ts2" <= $"ts1" + expr("INTERVAL 10 MINUTES"))
        .where(stream.Streams.ltBarrier($"id1", $"id2"))
      val q = joined.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      def ts(t: String) = Timestamp.valueOf(t)
      in1.addData((ts("2024-03-01 10:00:00"), 1L, 1L))
      in2.addData((ts("2024-03-01 10:01:00"), 1L, 2L))
      q.processAllAvailable()
      in1.addData((ts("2024-03-01 14:00:00"), 2L, 10L))
      in2.addData((ts("2024-03-01 14:00:30"), 2L, 11L))
      q.processAllAvailable()
      q.stop()
      assert(spark.table(name).count() == 2L)
    } finally {
      root.removeAppender(app)
      app.stop()
    }
    import scala.jdk.CollectionConverters._
    val bad = captured.asScala.filter(_.contains("Cannot evaluate expression"))
    assert(bad.isEmpty,
      s"state-watermark extraction still failing: ${bad.mkString("; ")}")
  }
}
