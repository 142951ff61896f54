package streamline

import graft.{SparkEntry, SparkSuite}

/** q_stream_drift semantics pins: a PLANTED drifted window (day 2's
  * values shifted +500 against a 0..99 background) must dominate the
  * windowed KS statistic, the still-open final window must NOT be
  * emitted (append-mode watermark closure), and every emitted
  * (n_w, d_num, d) must equal an in-JVM binned brute force computed
  * over the same reference — integer-exact, so a mis-scoped cumsum or
  * a wrong evaluation grid cannot hide. */
class DriftSpec extends SparkSuite {

  test("planted drifted window dominates; open window withheld; integers exact") {
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_drift")
      .toString
    val t0 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00").getTime
    // day 1: uniform 0..99; day 2: the same shape shifted +500 (the
    // planted drift); day 3: uniform again, but its window stays open
    // under the watermark (max ts − 10 min < day-3 window end)
    val rows = for (d <- 1 to 3; i <- 0 until 100) yield
      ((d * 1000 + i).toLong,
        new java.sql.Timestamp(t0 + (d - 1) * 86400000L + i * 60000L),
        i.toLong, "view",
        (i % 100).toDouble + (if (d == 2) 500.0 else 0.0), "{}")
    val prevTs = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType",
      "TIMESTAMP_MICROS")
    try {
      val tmp = s"$root/_w"
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.startsWith("part-")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$root/events.parquet"))
    } finally
      spark.conf.set("spark.sql.parquet.outputTimestampType", prevTs)

    // in-JVM binned brute force over the SAME reference (all 3 days)
    val ref = rows.map(r => math.floor(r._5).toLong).sorted
    val refBuckets = ref.distinct
    val nRef = ref.length.toLong
    def dNum(win: Seq[Long]): Long = {
      val nW = win.length.toLong
      refBuckets.map { b =>
        val kW = win.count(_ <= b).toLong
        val kRef = ref.count(_ <= b).toLong
        math.abs(nRef * kW - nW * kRef)
      }.max
    }
    val expected = (1 to 2).map { d => // day 3 open → withheld
      val win = rows.filter(_._1 / 1000 == d)
        .map(r => math.floor(r._5).toLong)
      val n = win.length.toLong
      val num = dNum(win)
      // the query's exact integer HALF_UP rounding (Aggregates
      // .exactRound6), not a rounded double quotient
      val den = BigInt(n) * BigInt(nRef)
      val scaled = (BigInt(2000000) * num + den) / (2 * den)
      (s"2024-02-0${d}T00:00", n, num, scaled.toDouble / 1000000.0)
    }

    try {
      // w_start is timestamp_ntz ⇒ LocalDateTime ("2024-02-01T00:00")
      val got = SparkEntry.queries("q_stream_drift")(spark, root).collect()
        .map(r => (r.get(0).toString,
          r.getLong(2), r.getLong(3), r.getDouble(4)))
      assert(got.toSeq === expected)
      // the drifted window must strictly dominate the background one
      assert(got(1)._4 > 1.5 * got(0)._4,
        "planted drift did not dominate the statistic")
    } finally stream.Streams.deleteRec(new java.io.File(root))
  }
}
