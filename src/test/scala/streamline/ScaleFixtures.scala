package streamline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared 1×/4×/16× blowup fixtures for the scaling-curve specs
  * (ScalingCurveSpec — batch; StreamScalingSpec — streaming state).
  * Built at most once per test JVM and removed — together with the
  * scratch dirs the streaming witnesses derive from the blowup paths —
  * by a shutdown hook, so repeated `sbt test` runs leave no parquet
  * litter (ADVICE r11).
  *
  * Blowup construction (see ScalingCurveSpec's scaladoc for the why):
  * id-shifted copies; document words suffixed per copy and embeddings
  * cyclically rotated so copies are near-dup-DISJOINT — otherwise
  * cross-copy duplicate pairs grow quadratically in the copy count by
  * construction and the curve answers the wrong question. */
object ScaleFixtures {

  private def spark = graft.SparkTestBase.spark
  private def sfDir = graft.SparkTestBase.sfDir

  val scales = Seq(1, 4, 16)

  lazy val dirs: Map[Int, String] = {
    val m = scales.map(k => k -> build(k)).toMap
    Runtime.getRuntime.addShutdownHook(new Thread(() => cleanup(m)))
    m
  }

  private def cleanup(m: Map[Int, String]): Unit = {
    m.values.foreach(d =>
      stream.Streams.deleteRec(new java.io.File(d)))
    // streaming witnesses key their scratch under the Scratch root by
    // the MANGLED source-dir path (util.Scratch.dir) — sweep those too
    val tmp = new java.io.File(util.Scratch.root)
    val mangled = m.values
      .map(_.replaceAll("[^A-Za-z0-9._-]", "_")).toSeq
    // Scratch.dir names are exactly `graft_<query>_<mangledSrcDir>` —
    // match that shape (prefix + suffix) rather than a bare substring
    // sweep, so an unrelated tmpdir entry that merely mentions the
    // path can never be deleted (ADVICE r12).
    Option(tmp.listFiles()).foreach(_.foreach { f =>
      if (f.getName.startsWith("graft_") &&
          mangled.exists(s => f.getName.endsWith(s)))
        stream.Streams.deleteRec(f)
    })
  }

  private def build(k: Int): String = {
    val sparkI = graft.SparkTestBase.spark
    import sparkI.implicits._
    val dir = Files.createTempDirectory(s"graft_scale_${k}x_").toString
    for (f <- new java.io.File(sfDir).listFiles()
         if f.getName.endsWith(".parquet"))
      Files.createSymbolicLink(Paths.get(dir, f.getName), f.toPath)
    def replace(name: String)(df: DataFrame): Unit = {
      val p = Paths.get(dir, name)
      Files.delete(p)
      df.write.parquet(p.toString)
    }
    val copies = spark.range(k).toDF("k")
    // events: ids shifted per copy (16× the users, per-user sequences
    // identical), timestamps untouched (windows get denser, not wider).
    // Write µs-annotated timestamps: the session default INT96 is
    // unreadable through Tables' forced-int64 encoding sniff.
    // …and publish as a single FILE named events.parquet, exactly like
    // the fixture layout: the streaming reader (Streams.eventsStream)
    // lists by filename glob, which a directory-of-part-files would
    // silently fail to match (zero input files, a flat fake curve).
    val prevTsType = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      val tmpOut = Files.createTempDirectory("graft_scale_ev_").toString
      Tables.events(spark, sfDir).crossJoin(copies)
        .select(($"event_id" + $"k" * 100000000L).as("event_id"), $"ts",
          ($"user_id" + $"k" * 100000000L).as("user_id"),
          $"event_type", $"value", $"props")
        .coalesce(1).write.mode("overwrite").parquet(tmpOut)
      val part = new java.io.File(tmpOut).listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file under $tmpOut"))
      Files.delete(Paths.get(dir, "events.parquet"))
      Files.move(part.toPath, Paths.get(dir, "events.parquet"))
      stream.Streams.deleteRec(new java.io.File(tmpOut))
    } finally
      spark.conf.set("spark.sql.parquet.outputTimestampType", prevTsType)
    // orders + lineitem (r13): key-shifted copies for the ITERATE
    // family — each copy is a DISJOINT replica of the customer–supplier
    // graph (o_orderkey/o_custkey and l_orderkey/l_suppkey shifted
    // together), so component structure per copy is identical: vertex
    // count and edges scale linearly while per-component diameter — and
    // hence the CC superstep count — stays CONSTANT. Dates untouched
    // (the 1997-01 month filter matches every copy). The +1e6 supplier
    // offset the queries apply cannot collide across the 1e8 shift.
    spark.conf.set("spark.sql.parquet.outputTimestampType",
      "TIMESTAMP_MICROS")
    try {
      replace("orders.parquet") {
        spark.read.parquet(s"$sfDir/orders.parquet").crossJoin(copies)
          .withColumn("o_orderkey", $"o_orderkey" + $"k" * 100000000L)
          .withColumn("o_custkey", $"o_custkey" + $"k" * 100000000L)
          .drop("k")
      }
      replace("lineitem.parquet") {
        spark.read.parquet(s"$sfDir/lineitem.parquet").crossJoin(copies)
          .withColumn("l_orderkey", $"l_orderkey" + $"k" * 100000000L)
          .withColumn("l_suppkey", $"l_suppkey" + $"k" * 100000000L)
          .drop("k")
      }
    } finally
      spark.conf.set("spark.sql.parquet.outputTimestampType", prevTsType)
    // documents: every word gets a copy-specific suffix (applied to
    // copy 0 too, so 1× and 16× run the same transform) — shingle /
    // simhash / tf-idf vocabularies are disjoint across copies
    replace("documents.parquet") {
      spark.read.schema(Tables.documentsSchema)
        .parquet(s"$sfDir/documents.parquet").crossJoin(copies)
        .select(($"doc_id" + $"k" * 10000000L).as("doc_id"),
          array_join(transform(split($"text", " "),
            w => concat(w, lit("x"), $"k".cast("string"))), " ").as("text"),
          $"lang", $"source")
        .withColumn("n_chars", length($"text").cast("long"))
        .select("doc_id", "text", "lang", "source", "n_chars")
    }
    // embeddings: cyclic coordinate rotation per copy — cosine between
    // different copies of the same vector ≈ random, so LSH buckets
    // grow linearly in copies, not quadratically
    replace("embeddings.parquet") {
      spark.read.schema(Tables.embeddingsSchema)
        .parquet(s"$sfDir/embeddings.parquet").crossJoin(copies)
        .select(($"vec_id" + $"k" * 10000000L).as("vec_id"),
          concat(slice($"embedding", ($"k" % 64) + lit(1), lit(64) - ($"k" % 64)),
            slice($"embedding", lit(1), $"k" % 64)).as("embedding"),
          $"label")
    }
    dir
  }
}
