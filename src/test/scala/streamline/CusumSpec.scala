package streamline

import graft.{SparkEntry, SparkSuite}

/** q_win_cusum semantics pins (SURVEY.md §2.5):
  *
  * 1. Closed-form ≡ recursion: the two-window spelling
  *    `C_i − least(min_{j≤i} C_j, 0)` must equal the literal one-sided
  *    CUSUM fold `S_i = max(0, S_{i−1} + dev_i)` (S_0 = 0) row for
  *    row — brute-forced here in plain Scala over every key.
  * 2. First-row alarm (the r13 advice regression): a key whose very
  *    first deviation already exceeds the threshold must alarm on that
  *    row. Omitting C_0 = 0 from the running min forces S_1 = 0 and
  *    silently swallows exactly this case.
  *
  * Fixture: integer-valued events so μ (exact-decimal mean / count)
  * and every deviation are exact doubles; user 9 is the first-row
  * spike, user 7 drifts up gradually, user 8 stays quiet.
  */
class CusumSpec extends SparkSuite {

  test("cusum closed form equals the brute-force recursion, incl. first-row alarms") {
    val sparkI = graft.SparkTestBase.spark
    import sparkI.implicits._
    val spark = graft.SparkTestBase.spark
    val dir = java.nio.file.Files.createTempDirectory("graft_cusum").toString
    // (event_id, ts, user_id, event_type, value, props); ts ns-epoch.
    val rows = Seq(
      (1L, 1000L, 7L, "click", 100.0, "{}"),
      (2L, 2000L, 7L, "click", 200.0, "{}"),
      (3L, 3000L, 7L, "click", 300.0, "{}"),
      (4L, 4000L, 7L, "click", 400.0, "{}"),
      (5L, 1000L, 8L, "view", 10.0, "{}"),
      (6L, 2000L, 8L, "view", 20.0, "{}"),
      (7L, 3000L, 8L, "view", 10.0, "{}"),
      (8L, 1000L, 9L, "view", 500.0, "{}")) // first-row spike
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_w")
    val part = new java.io.File(s"$dir/_w").listFiles()
      .find(f => f.getName.startsWith("part-")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))

    val mu = rows.map(_._5).sum / rows.size // integers: exact in double
    val expected = rows.groupBy(_._3).toSeq.flatMap { case (_, rs) =>
      var s = 0.0
      rs.sortBy(r => (r._2, r._1)).map { r =>
        s = math.max(0.0, s + (r._5 - mu - 50.0))
        (r._1, r._3, s)
      }
    }.filter(_._3 > 200.0)
      // mirror Spark round() exactly (HALF_UP on the shortest decimal
      // image) — math.rint is half-EVEN and would diverge on a .5 tie
      .map { case (id, u, s) =>
        (id, u, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
      }
      .sortBy(_._1)

    val got = SparkEntry.queries("q_win_cusum")(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq

    assert(got === expected)
    // the regression pin: user 9's single row must alarm
    assert(got.exists(_._1 == 8L),
      "first-row alarm missing — C_0 = 0 dropped from the running min")

    streamline.stream.Streams.deleteRec(new java.io.File(dir))
  }
}
