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

  /** `events.ts` is parquet timestamp[ns], which Spark 4 refuses to read
    * as TimestampType; it is read as raw int64 nanos (legacy
    * `nanosAsLong` flag) and floor-converted to a µs TimestampType in
    * [[events]] — matching DuckDB's `date_trunc('microseconds', ts)`. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // raw ns since epoch (see above)
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
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, dir, "events", eventsSchema)
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
  def documents(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "documents", documentsSchema)
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "embeddings", embeddingsSchema)
}
