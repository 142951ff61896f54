package streamline

import java.sql.Timestamp

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** q_stream_dedup's round-1 weak finding was unbounded dedup state
  * (plain dropDuplicates on keys without an event-time column can never
  * expire). This spec witnesses the fix: with
  * `dropDuplicatesWithinWatermark` the state store EVICTS keys once the
  * watermark passes their expiry, so total state rows stay below the
  * number of distinct keys ever seen.
  */
class DedupStateEvictionSpec extends SparkSuite {

  test("dropDuplicatesWithinWatermark evicts expired dedup state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val name = s"dedup_evict_${System.identityHashCode(input)}"
    val deduped = input.toDS().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("k")
    val q = deduped.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    def ts(t: String) = Timestamp.valueOf(t)
    input.addData((ts("2024-03-01 10:00:00"), 1L),
      (ts("2024-03-01 10:02:00"), 2L))
    q.processAllAvailable()
    // Watermark jumps to ~11:50 — keys 1,2 (expiry ~10:10) become
    // evictable on the next batch.
    input.addData((ts("2024-03-01 12:00:00"), 3L),
      (ts("2024-03-01 12:01:00"), 4L))
    q.processAllAvailable()
    input.addData((ts("2024-03-01 13:00:00"), 5L))
    q.processAllAvailable()
    val lastState = q.recentProgress.toSeq
      .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
      .lastOption
    q.stop()
    assert(lastState.nonEmpty, "expected a stateful operator in progress")
    val total = lastState.get.numRowsTotal
    // 5 distinct keys were inserted; eviction must have dropped the
    // expired ones (plain dropDuplicates would report 5).
    assert(total < 5, s"dedup state never evicted: numRowsTotal=$total")
  }
}
