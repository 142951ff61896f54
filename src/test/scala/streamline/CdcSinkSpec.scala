package streamline

import java.sql.Timestamp

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import streamline.stream.Streams

/** q_sink_cdc's merge contract, driven batch by batch: the latest op
  * per key wins, a tombstone ('D') removes the key from the read view
  * but STAYS in state (so replayed older upserts cannot resurrect it),
  * and a genuinely later upsert does resurrect it. */
class CdcSinkSpec extends SparkSuite {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def batch(rows: (Long, Long, Long, String, Double)*): DataFrame = {
    val sp = spark
    import sp.implicits._
    rows.toSeq.map { case (u, t, e, op, v) => (u, ts(t), e, op, v) }
      .toDF("user_id", "ts", "event_id", "op", "value")
  }

  private def readView(state: DataFrame): Map[Long, (Long, Double, Long)] = {
    val sp = spark
    import sp.implicits._
    state.where($"op" =!= "D")
      .select($"user_id", $"event_id", $"value", $"n_ops")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
  }

  test("tombstone removes the key; later upsert resurrects it") {
    val g1 = Streams.cdcMerge(None, batch((1L, 10L, 100L, "U", 1.0),
      (2L, 10L, 101L, "U", 5.0)))
    assert(readView(g1) == Map(1L -> ((100L, 1.0, 1L)),
      2L -> ((101L, 5.0, 1L))))

    // Delete key 1: gone from the read view, n_ops keeps counting.
    val g2 = Streams.cdcMerge(Some(g1), batch((1L, 20L, 102L, "D", 0.0)))
    assert(readView(g2) == Map(2L -> ((101L, 5.0, 1L))))
    assert(g2.count() == 2, "tombstone must stay in state")

    // Resurrect key 1 with a later upsert.
    val g3 = Streams.cdcMerge(Some(g2), batch((1L, 30L, 103L, "U", 7.0)))
    assert(readView(g3) == Map(1L -> ((103L, 7.0, 3L)),
      2L -> ((101L, 5.0, 1L))))
  }

  test("replayed older upsert cannot resurrect a deleted key") {
    val g1 = Streams.cdcMerge(None, batch((1L, 10L, 100L, "U", 1.0)))
    val g2 = Streams.cdcMerge(Some(g1), batch((1L, 20L, 102L, "D", 0.0)))
    // An out-of-order redelivery of the t=10 upsert arrives AFTER the
    // delete: the tombstone's (ts, event_id) is later, so it wins.
    val g3 = Streams.cdcMerge(Some(g2), batch((1L, 10L, 100L, "U", 1.0)))
    assert(readView(g3).isEmpty)
  }

  test("ties on ts break by event_id, matching the oracle's total order") {
    val g1 = Streams.cdcMerge(None, batch((1L, 10L, 100L, "U", 1.0),
      (1L, 10L, 101L, "U", 2.0)))
    assert(readView(g1) == Map(1L -> ((101L, 2.0, 2L))))
  }
}
