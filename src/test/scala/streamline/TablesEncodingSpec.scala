package streamline

import java.io.File

import graft.SparkSuite
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.functions._

/** The round-9 landmine class, pinned: `events.ts` has shipped in TWO
  * parquet encodings — timestamp[ns] (early fixtures; Spark 4 reads it
  * as raw int64 under `nanosAsLong`) and timestamp[us] (round 9
  * onwards). This spec synthesizes the SAME rows in both encodings in
  * a temp dir (the ns file via parquet-java's example writer — Spark
  * itself cannot emit TIMESTAMP(NANOS)), and pins (a) the footer sniff
  * `Tables.eventsTsIsNanos` on each, (b) bit-identical query output
  * through `Tables.events` for both, and (c) that REGENERATING a
  * fixture in place with the other encoding is a sniff-cache MISS
  * (the cache keys on the file fingerprint, not the directory — a
  * directory-keyed cache would silently mis-scale timestamps by 1000×
  * after an in-place regen). */
class TablesEncodingSpec extends SparkSuite {

  private val nsSchema: MessageType = Types.buildMessage()
    .required(INT64).named("event_id")
    .required(INT64)
    .as(LogicalTypeAnnotation.timestampType(false, TimeUnit.NANOS))
    .named("ts")
    .required(INT64).named("user_id")
    .required(BINARY).as(LogicalTypeAnnotation.stringType())
    .named("event_type")
    .required(DOUBLE).named("value")
    .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
    .named("events")

  // Deterministic sample spanning two days, with a ts collision.
  private val rows: Seq[(Long, Long, Long, String, Double, String)] =
    (1L to 24L).map { i =>
      val tsUs = 1700000000000000L + i * 3600L * 1000 * 1000 + i * 7
      (i, tsUs, i % 5, if (i % 3 == 0) "click" else "view",
        i * 1.25, s"""{"k": $i}""")
    }

  private def writeNs(file: String): Unit = {
    new File(file).getParentFile.mkdirs()
    val w = ExampleParquetWriter.builder(new HPath(file))
      .withType(nsSchema)
      .withConf(new org.apache.hadoop.conf.Configuration())
      .build()
    val f = new SimpleGroupFactory(nsSchema)
    try rows.foreach { case (id, tsUs, uid, typ, v, props) =>
      val g = f.newGroup()
      g.add("event_id", id)
      g.add("ts", tsUs * 1000L) // ns
      g.add("user_id", uid)
      g.add("event_type", typ)
      g.add("value", v)
      g.add("props", props)
      w.write(g)
    } finally w.close()
  }

  private def writeUs(dir: String): Unit = {
    val sp = spark
    import sp.implicits._
    // timestamp_ntz + TIMESTAMP_MICROS = the pyarrow fixture footprint:
    // unadjusted int64 µs (session TZ is UTC, so the cast is exact).
    streamline.batch.SkewJoin.withConfs(sp, Seq(
      "spark.sql.parquet.outputTimestampType" -> "TIMESTAMP_MICROS")) {
      rows.toDF("event_id", "ts_us", "user_id", "event_type", "value",
          "props")
        .select($"event_id",
          timestamp_micros($"ts_us").cast("timestamp_ntz").as("ts"),
          $"user_id", $"event_type", $"value", $"props")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
  }

  private def collectEvents(dir: String): Seq[(Long, Long, String, Double)] = {
    val sp = spark
    import sp.implicits._
    Tables.events(sp, dir)
      .select($"event_id", unix_micros($"ts").as("ts_us"), $"event_type",
        $"value")
      .as[(Long, Long, String, Double)]
      .collect().toSeq.sortBy(_._1)
  }

  private def freshDir(name: String): String = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_encspec_$name"
    Streams0.deleteRec(new File(d))
    d
  }
  private object Streams0 { // local alias avoids a main-source import cycle
    def deleteRec(f: File): Unit = streamline.stream.Streams.deleteRec(f)
  }

  private def writeMs(dir: String): Unit = {
    val sp = spark
    import sp.implicits._
    streamline.batch.SkewJoin.withConfs(sp, Seq(
      "spark.sql.parquet.outputTimestampType" -> "TIMESTAMP_MILLIS")) {
      // LTZ, not NTZ: outputTimestampType only governs TimestampType;
      // NTZ always writes MICROS. Session TZ is UTC, so the raw epoch
      // values are identical either way.
      rows.toDF("event_id", "ts_us", "user_id", "event_type", "value",
          "props")
        .select($"event_id", timestamp_micros($"ts_us").as("ts"),
          $"user_id", $"event_type", $"value", $"props")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
  }

  test("ns, us, and ms encodings sniff correctly and read identically") {
    val dirNs = freshDir("ns"); val dirUs = freshDir("us")
    val dirMs = freshDir("ms")
    writeNs(s"$dirNs/events.parquet")
    writeUs(dirUs)
    writeMs(dirMs)
    assert(Tables.eventsTsUnit(spark, dirNs) == "NANOS")
    assert(Tables.eventsTsIsNanos(spark, dirNs))
    assert(Tables.eventsTsUnit(spark, dirUs) == "MICROS")
    assert(Tables.eventsTsUnit(spark, dirMs) == "MILLIS")
    val expected = rows.map(r => (r._1, r._2, r._4, r._5))
    assert(collectEvents(dirNs) == expected)
    assert(collectEvents(dirUs) == expected)
    // the ms encoding cannot carry the sample's sub-ms component; the
    // reader must surface exactly the ms-truncated instants
    val expectedMs = rows.map(r => (r._1, r._2 / 1000 * 1000, r._4, r._5))
    assert(collectEvents(dirMs) == expectedMs)
  }

  test("in-place regeneration with the other encoding is a cache miss") {
    val dir = freshDir("regen")
    writeUs(dir)
    assert(!Tables.eventsTsIsNanos(spark, dir))
    assert(collectEvents(dir) == rows.map(r => (r._1, r._2, r._4, r._5)))
    // Regenerate IN PLACE as ns (the round-9 landmine, inverted).
    Streams0.deleteRec(new File(s"$dir/events.parquet"))
    writeNs(s"$dir/events.parquet")
    assert(Tables.eventsTsIsNanos(spark, dir),
      "regenerated fixture must re-sniff (fingerprint cache key)")
    assert(collectEvents(dir) == rows.map(r => (r._1, r._2, r._4, r._5)))
  }
}
