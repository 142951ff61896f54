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
}
