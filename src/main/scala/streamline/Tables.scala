package streamline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Schema-pinned readers for the driver-generated test tables.
  *
  * Schemas are the measured ground truth from `/root/repo/FIXTURES.md`
  * (extracted from the sf0.001 parquet files); they are pinned
  * explicitly — never inferred — so every query plan is deterministic
  * (SURVEY.md §1.2). The reference lineage (Flink 1.x Table sources)
  * likewise declares fixed schemas; see SURVEY.md §1.1.
  *
  * Scale posture: each reader is a plain parquet scan, so Catalyst
  * predicate pushdown + column pruning apply to every downstream query.
  * At 100 TB these would be partitioned/bucketed table reads; the query
  * code never assumes single-file inputs.
  */
object Tables {

  val lineitemSchema: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  val ordersSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val customerSchema: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplierSchema: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val partSchema: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val nationSchema: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val regionSchema: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  /** `events.ts` has shipped in two fixture encodings: parquet
    * timestamp[ns] (early rounds — Spark 4 refuses to read it as
    * TimestampType, so it is read as raw int64 nanos under the legacy
    * `nanosAsLong` flag) and timestamp[us] (round 9 onwards). BOTH are
    * read through this forced-LongType schema — the parquet reader
    * hands back the raw int64 either way — and [[events]] converts to
    * a µs TimestampType with a divisor chosen by footer sniff
    * ([[eventsTsIsNanos]]). Going through the raw long +
    * `timestamp_micros` keeps the value session-timezone-independent
    * (the fixture's timestamps are unadjusted/NTZ; a forced
    * TimestampType read would re-interpret them through the session
    * zone), matching DuckDB's `date_trunc('microseconds', ts)`. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // raw ns/µs/ms since epoch (see above)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType))) // JSON string, shape {"k": <int>}

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)), // dim = 64
    StructField("label", IntegerType)))

  private def read(spark: SparkSession, dir: String, name: String,
                   schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "lineitem", lineitemSchema)
  def orders(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "orders", ordersSchema)
  def customer(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "customer", customerSchema)
  def supplier(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "supplier", supplierSchema)
  def part(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "part", partSchema)
  def nation(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "nation", nationSchema)
  def region(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "region", regionSchema)
  private val tsUnitCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Cache key for the footer sniff: the directory PLUS a recursive
    * (path, length, mtime) fingerprint of `events.parquet`. Keying on
    * the directory alone would pin the first sniff for the JVM
    * lifetime — if the fixture is regenerated in place with a
    * DIFFERENT encoding while a session is running (exactly the
    * round-9 landmine the sniff exists for), every later read would
    * silently mis-scale timestamps by 1000×. The fingerprint makes
    * regeneration a cache miss; the stat walk is one metadata call per
    * file, paid once per distinct fixture generation. */
  private def eventsFingerprint(dir: String): String = {
    def walk(f: java.io.File): String =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).sortBy(_.getName)
          .map(walk).mkString(";")
      else s"${f.getName}:${f.length}:${f.lastModified}"
    dir + "|" + walk(new java.io.File(s"$dir/events.parquet"))
  }

  /** The parquet TIMESTAMP unit of `events.ts`, read STRAIGHT FROM THE
    * FILE FOOTER (parquet-java), cached per fixture generation —
    * "NANOS" / "MICROS" / "MILLIS". The round-9/-10 sniff inferred the
    * unit from a Spark-inference quirk (`nanosAsLong` maps NANOS to
    * LongType) and could therefore only distinguish ns-vs-not: a
    * future regen to timestamp[ms] would silently read 1000× off. The
    * footer's logical-type annotation is the ground truth and names
    * all three units. */
  def eventsTsUnit(spark: SparkSession, dir: String): String =
    tsUnitCache.computeIfAbsent(eventsFingerprint(dir), _ => {
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import org.apache.parquet.schema.LogicalTypeAnnotation
      val conf = spark.sparkContext.hadoopConfiguration
      val root = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
      val fs = root.getFileSystem(conf)
      // fixture ships as one file; tolerate a directory of part files
      val dataFile =
        if (fs.getFileStatus(root).isDirectory)
          fs.listStatus(root).map(_.getPath)
            .filter(p => !p.getName.startsWith("_") &&
              !p.getName.startsWith("."))
            .minBy(_.getName.toString)
        else root
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(dataFile, conf))
      try {
        reader.getFooter.getFileMetaData.getSchema
          .getType(Array("ts"): _*) // Java varargs path selector
          .asPrimitiveType().getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit.name()
          // an UNANNOTATED int64 ts is the legacy raw-ns layout the
          // synthetic test fixtures write (a plain Long column carrying
          // ns-epoch values — the same wire shape the original ns
          // fixture read as); anything else is refused, not guessed
          case null => "NANOS"
          case other => sys.error(
            s"events.ts is not an annotated timestamp ($other) — " +
              "refusing to guess its unit")
        }
      } finally reader.close()
    })

  /** ns-sniff view of [[eventsTsUnit]] (kept for the encoding spec). */
  def eventsTsIsNanos(spark: SparkSession, dir: String): Boolean =
    eventsTsUnit(spark, dir) == "NANOS"

  /** Raw-int64 → µs conversion expression for the fixture's unit. */
  private[streamline] def eventsTsToUsExpr(spark: SparkSession,
                                           dir: String): String =
    eventsTsUnit(spark, dir) match {
      case "NANOS"  => "ts DIV 1000"
      case "MICROS" => "ts"
      case "MILLIS" => "ts * 1000"
      case u        => sys.error(s"unsupported events.ts unit $u")
    }

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val toUs = eventsTsToUsExpr(spark, dir)
    read(spark, dir, "events", eventsSchema)
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr(toUs)))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
  def documents(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "documents", documentsSchema)
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "embeddings", embeddingsSchema)
}
