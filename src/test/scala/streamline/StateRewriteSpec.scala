package streamline

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** Pins q_stream_state_rewrite, the offline state REWRITE witness: the
  * checkpointed state of a half-drained windowed aggregate is read via
  * the `statestore` source, converted to carrier rows, rebuilt into a
  * fresh checkpoint at a DIFFERENT state-partition count, and the run
  * continues there. Beyond the DuckDB oracle (which hashes the full
  * result), this spec pins the two operational claims directly:
  * the restarted operator observes the NEW partition count (5 — the
  * count q_stream_rescale proves unreachable by conf change alone),
  * and the migrated aggregate equals the uninterrupted single-run
  * computation bit-for-bit. */
class StateRewriteSpec extends SparkSuite {

  test("rewritten state runs at the new partition count with the " +
      "uninterrupted-run aggregate") {
    val sp = spark
    import sp.implicits._
    val got = SparkEntry.queries("q_stream_state_rewrite")(sp, sfDir)
      .collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getAs[Long]("n_state_parts") == 5L),
      "restarted operator must observe the REWRITTEN count 5")

    val events = Tables.events(sp, sfDir)
    val wmUs = events
      .agg((floor(unix_micros(max($"ts")) / 1000L) * 1000L -
        10L * 60 * 1000 * 1000).as("w")).head().getAs[Long]("w")
    val expected = events
      .groupBy(date_trunc("day", $"ts").as("w_start"), $"event_type")
      .agg(streamline.util.Det.dsum("value").as("sum_val"),
        count(lit(1)).as("n"))
      .where(unix_micros($"w_start") + 86400000000L <= wmUs)
      .select($"w_start".cast("timestamp_ntz").as("w_start"),
        $"event_type", $"sum_val", $"n", lit(5L).as("n_state_parts"))
      .collect()
    assert(got.map(_.toSeq).toSet == expected.map(_.toSeq).toSet,
      s"got ${got.length} rows vs expected ${expected.length}")
  }
}
