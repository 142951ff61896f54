package streamline

import java.sql.Timestamp

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import streamline.stream.CepStream

/** End-to-end multi-batch run of the streaming CEP operator through the
  * real micro-batch engine (MemoryStream → flatMapGroupsWithState with
  * EventTimeTimeout): a run that spans batches completes when the
  * watermark seals its purchase, and a buffered suffix drains on a
  * TIMER batch (no new data for the key) once the watermark passes it. */
class CepStreamIntegrationSpec extends SparkSuite {

  test("a click run buffered in batch 1 matches its purchase after the watermark passes") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, String, Timestamp)]
    val name = s"cep_it_${System.identityHashCode(input)}"
    val matches = input.toDS()
      .toDF("user_id", "event_id", "event_type", "ts")
      .withWatermark("ts", "10 minutes")
      .as[CepStream.CepRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[CepStream.CepRow],
         state: org.apache.spark.sql.streaming.GroupState[CepStream.CepBuf]) =>
          CepStream.updateCepStream(uid, rows.map(_.toEv), state)
      }
    val q = matches.toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    def ts(t: String) = Timestamp.valueOf(t)
    // batch 1: two clicks and the purchase, all within 10 min — but the
    // watermark is still 0, so everything buffers.
    input.addData((1L, 1L, "click", ts("2024-03-01 10:00:00")),
      (1L, 2L, "click", ts("2024-03-01 10:01:00")),
      (1L, 3L, "purchase", ts("2024-03-01 10:05:00")))
    q.processAllAvailable()
    // batch 2: a far-future event for ANOTHER user advances the
    // watermark past user 1's buffer; user 1 gets no new data, so the
    // drain must come from the event-time TIMER.
    input.addData((2L, 9L, "view", ts("2024-03-01 13:00:00")))
    q.processAllAvailable()
    // one more batch so timers armed against the new watermark fire
    input.addData((2L, 10L, "view", ts("2024-03-01 13:00:01")))
    q.processAllAvailable()
    q.stop()
    val out = spark.table(name)
      .select($"user_id", $"n_clicks", $"first_click_id", $"purchase_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 1L, 3L)),
      s"expected the buffered run to complete via timer drain, got $out")
  }
}
