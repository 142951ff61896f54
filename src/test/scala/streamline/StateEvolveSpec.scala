package streamline

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** Pins q_stream_state_evolve, the state-schema-evolution witness:
  * (1) Spark's state-store schema validation REJECTS a widened
  * aggregate restarted in place on the old checkpoint (the
  * restart_rejected output column — a vacuously-succeeding restart
  * or a silent acceptance fails here), and (2) the migrated run's
  * columns carry the declared semantics: sum/count exact over ALL
  * rows (old partials included via carriers), the NEW max column
  * computed over post-migration rows only and NULL where a window saw
  * none. */
class StateEvolveSpec extends SparkSuite {

  test("in-place widened restart is rejected; migrated aggregate has " +
      "metric-starts-at-migration semantics") {
    val sp = spark
    import sp.implicits._
    val got = SparkEntry.queries("q_stream_state_evolve")(sp, sfDir)
      .collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getAs[Boolean]("restart_rejected")),
      "the naive widened restart must be refused by schema validation")

    val events = Tables.events(sp, sfDir)
    val bnd = events.agg(min($"ts"), max($"ts")).head()
    val cutUs = (bnd.getTimestamp(0).getTime +
      bnd.getTimestamp(1).getTime) / 2 * 1000L
    def wmUs(df: org.apache.spark.sql.DataFrame): Long = df
      .agg((floor(unix_micros(max($"ts")) / 1000L) * 1000L -
        10L * 60 * 1000 * 1000).as("w")).head().getAs[Long]("w")
    val wm1 = wmUs(events.where(unix_micros($"ts") < cutUs))
    val wmf = wmUs(events)
    val expected = events
      .groupBy(date_trunc("day", $"ts").as("w_start"), $"event_type")
      .agg(streamline.util.Det.dsum("value").as("sum_val"),
        count(lit(1)).as("n"),
        max(when(unix_micros($"ts") >= cutUs, $"value")).as("max_val"))
      .where(unix_micros($"w_start") + 86400000000L > wm1 &&
        unix_micros($"w_start") + 86400000000L <= wmf)
      .select($"w_start".cast("timestamp_ntz").as("w_start"),
        $"event_type", $"sum_val", $"n", $"max_val",
        lit(true).as("restart_rejected"))
      .collect()
    assert(got.map(_.toSeq).toSet == expected.map(_.toSeq).toSet,
      s"got ${got.length} rows vs expected ${expected.length}")
  }
}
