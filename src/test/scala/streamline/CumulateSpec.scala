package streamline

import java.sql.Timestamp

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** q_stream_cumulate semantics pins (SURVEY.md §2.9):
  *
  * 1. Carry-forward: a cumulate window whose LATEST slice is empty still
  *    emits the cumulative carried from earlier slices — the property
  *    that distinguishes CUMULATE from a plain tumble (a tumble of the
  *    empty slice emits nothing).
  * 2. Emission bound: windows end-bounded by M = max closed slice end —
  *    a window whose end exceeds M is withheld even if its data slices
  *    are all closed (mirrors the oracle's WHERE w_end <= M).
  *
  * Synthetic fixture (written as the same ns-epoch parquet layout the
  * file source reads): day-1 events in slice 1 (00:30, 01:00) and
  * slice 3 (17:00); slice 2 (06–12h) EMPTY; a day-2 13:00 event drives
  * the final watermark to day-2 12:50, so closed nonempty slices are
  * day-1 s1 and s3 ⇒ M = day-1 18:00. Expected emissions for day 1:
  *   k=1 [00,06): n=2        (slice 1)
  *   k=2 [00,12): n=2        (carry across the empty slice 2)
  *   k=3 [00,18): n=3        (slice 1 + slice 3)
  * and k=4 (end = day-2 00:00 > M) withheld; no day-2 windows.
  */
class CumulateSpec extends SparkSuite {

  private def nanos(s: String): Long =
    Timestamp.valueOf(s).getTime * 1000000L

  test("cumulate carries over empty slices and stops at the slice bound") {
    val sparkI = graft.SparkTestBase.spark
    import sparkI.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cum").toString
    val rows = Seq(
      (1L, nanos("2024-03-01 00:30:00"), 7L, "click", 1.0, "{}"),
      (2L, nanos("2024-03-01 01:00:00"), 7L, "click", 2.0, "{}"),
      (3L, nanos("2024-03-01 17:00:00"), 8L, "view", 4.0, "{}"),
      (4L, nanos("2024-03-02 13:00:00"), 9L, "view", 8.0, "{}"))
    // The file source globs on FILE names (events.parquet is a single
    // file in the fixtures, not a directory) — write then rename the
    // lone part file to match.
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_w")
    val part = new java.io.File(s"$dir/_w").listFiles()
      .find(f => f.getName.startsWith("part-")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))

    val out = SparkEntry.queries("q_stream_cumulate")(spark, dir)
      .select($"w_end".cast("string"), $"n", $"sum_val")
      .as[(String, Long, Double)].collect().toSeq

    assert(out === Seq(
      ("2024-03-01 06:00:00", 2L, 3.0),
      ("2024-03-01 12:00:00", 2L, 3.0), // carried over the empty slice
      ("2024-03-01 18:00:00", 3L, 7.0)))

    streamline.stream.Streams.deleteRec(new java.io.File(dir))
  }
}
