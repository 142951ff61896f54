package streamline.batch

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator
import streamline.{Q, Tables}

/** Enrichment-side operators of the reference lineage's DataStream API:
  * async external lookups (upstream `flink-streaming-java/.../async/
  * AsyncFunction.java`, `AsyncDataStream.orderedWait`) and job-level
  * metrics counters (upstream `flink-core/.../accumulators/
  * Accumulator.java`, `IntCounter`).
  */
object Enrich {

  /** q_async_enrich — AsyncDataStream.orderedWait: enrich each event
    * against an external keyed service without blocking one request at
    * a time. The Spark-native shape is `mapPartitions` issuing a
    * BOUNDED WINDOW of concurrent futures per partition and emitting
    * results in arrival order (ordered wait): per 64-row window, all
    * lookups fly concurrently, then the window is awaited in input
    * order — the same capacity/ordering contract as Flink's operator.
    * The "service" here is a broadcast key-value map (the container has
    * no external endpoint); the future-window plumbing is the real
    * operator and is what a user swaps an HTTP/DB client into, one
    * client per partition. Scale: no shuffle on the big side, capacity
    * × partitions in-flight requests, backpressure via window await. */
  private def asyncEnrich(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val service = spark.sparkContext.broadcast(
      Tables.customer(spark, dir)
        .select($"c_custkey", $"c_name").as[(Long, String)]
        .collect().toMap)
    val capacity = 64
    Tables.events(spark, dir)
      .where($"event_type" === "purchase")
      .select($"event_id", $"user_id").as[(Long, Long)]
      .mapPartitions { it =>
        // one "client" (thread pool) per partition, as with a real
        // async HTTP/DB client; daemon threads so the executor exits
        // even if a task dies mid-partition.
        val pool = java.util.concurrent.Executors.newFixedThreadPool(8, r => {
          val t = new Thread(r); t.setDaemon(true); t
        })
        implicit val ec: ExecutionContext =
          ExecutionContext.fromExecutorService(pool)
        val kv = service.value
        val out = it.grouped(capacity).flatMap { window =>
          val inFlight = window.map { case (eid, uid) =>
            Future { (eid, uid, kv.get(uid)) }
          }
          // orderedWait: await the whole window, emit in input order
          inFlight.map(f => Await.result(f, 30.seconds))
        }
        // close the client when the partition drains — threads must not
        // accumulate across partitions × runs in a long-lived executor.
        new Iterator[(Long, Long, Option[String])] {
          def hasNext: Boolean = {
            val h = out.hasNext
            if (!h) pool.shutdown()
            h
          }
          def next(): (Long, Long, Option[String]) = out.next()
        }
      }
      .flatMap { case (eid, uid, name) => name.map(n => (eid, uid, n)) }
      .toDF("event_id", "user_id", "c_name")
      .orderBy($"event_id")
  }

  private val asyncEnrichSql = """
    SELECT event_id, user_id, c_name
    FROM events JOIN customer ON user_id = c_custkey
    WHERE event_type = 'purchase'
    ORDER BY event_id"""

  /** The malformed-row counter of the last q_acc_metrics run — Flink's
    * job accumulator surface (IntCounter reported with the job result).
    * Exposed for AccumulatorSpec; the driver compare sees only the main
    * output. */
  @volatile private[streamline] var lastMalformed: Option[LongAccumulator] = None

  /** q_acc_metrics — accumulators: count rows REJECTED by a parse step
    * as a job metric while the query emits only the clean rows — the
    * standard data-quality counter a pipeline reports without paying a
    * second pass. The rejected count never touches the row stream (no
    * union, no extra shuffle); it travels to the driver with task
    * results, exactly like Flink accumulators travel with the job
    * result. */
  private def accMetrics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val malformed = spark.sparkContext.longAccumulator("malformed_props")
    lastMalformed = Some(malformed)
    val parsed = Tables.events(spark, dir)
      .select($"event_id", $"event_type",
        get_json_object($"props", "$.k").as("k"))
      .as[(Long, String, String)]
      .mapPartitions(_.flatMap { case (id, et, k) =>
        if (k == null) { malformed.add(1L); None }
        else Some((id, et, k))
      })
    parsed.toDF("event_id", "event_type", "k")
      .groupBy($"event_type", $"k")
      .agg(count(lit(1)).as("n"))
      .orderBy($"event_type", $"k")
  }

  private val accMetricsSql = """
    SELECT event_type, json_extract_string(props, '$.k') AS k,
           count(*) AS n
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY event_type, k
    ORDER BY event_type, k"""

  /** q_dist_cache — the reference lineage's distributed cache (upstream
    * `flink-core/.../cache/DistributedCache.java`,
    * `ExecutionEnvironment.registerCachedFile`): a small reference FILE
    * is shipped to every task once, and tasks read it locally instead
    * of joining against it. Spark's equivalent pair is
    * `SparkContext.addFile` + `SparkFiles.get`: the file rides the
    * torrent-backed file server to each executor exactly once per job,
    * then every partition opens the LOCAL copy — the pattern for
    * side-data that is not a table (geo databases, model files,
    * tokenizer vocabularies) where a broadcast DataFrame join is the
    * wrong shape. Here the region id→name mapping is staged as a CSV,
    * shipped, and used to enrich nation map-side; at 100 TB the
    * enrich stays shuffle-free and the file ships O(executors), not
    * O(tasks). Oracle = the plain dimension join (enrichment path must
    * be invisible in the result). */
  private def distCache(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Stage the reference file (driver-side, 5 rows — metadata-scale).
    // Basename carries a CONTENT hash: SparkFiles resolves by basename
    // (one JVM may register files for several scale factors), same
    // content always maps to the same name (so a re-run re-registers
    // an identical file, which addFile allows), and two concurrent
    // JVMs can only race on byte-identical payloads — settled by an
    // atomic rename of a private temp file, never an in-place
    // truncate-while-registered.
    val regions = Tables.region(spark, dir)
      .select($"r_regionkey", $"r_name").as[(Int, String)]
      .collect().sortBy(_._1)
    val payload = regions.map { case (k, n) => s"$k,$n\n" }.mkString
    val hash = java.security.MessageDigest.getInstance("SHA-256")
      .digest(payload.getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
    val tmpDir = new java.io.File(sys.props("java.io.tmpdir"))
    val f = new java.io.File(tmpDir, s"graft_regions_$hash.csv")
    if (!f.exists()) {
      val staging =
        java.io.File.createTempFile("graft_regions_", ".tmp", tmpDir)
      val w = new java.io.PrintWriter(staging, "UTF-8")
      try w.print(payload) finally w.close()
      // Atomic publish; losing the rename race means an identical file
      // already landed (name is content-addressed) — just discard ours.
      if (!staging.renameTo(f)) staging.delete(): Unit
    }
    f.deleteOnExit()
    spark.sparkContext.addFile(f.getAbsolutePath)
    val base = f.getName
    Tables.nation(spark, dir)
      .select($"n_nationkey", $"n_name", $"n_regionkey")
      .as[(Int, String, Int)]
      .mapPartitions { it =>
        // one local read per partition; real deployments parse once
        // per executor via a lazy val holder object
        val src = scala.io.Source.fromFile(
          org.apache.spark.SparkFiles.get(base), "UTF-8")
        val lookup = try src.getLines().map { l =>
          val Array(k, n) = l.split(",", 2); k.toInt -> n
        }.toMap finally src.close()
        it.map { case (nk, nn, rk) => (nk, nn, lookup(rk)) }
      }
      .toDF("n_nationkey", "n_name", "r_name")
      .orderBy($"n_nationkey")
  }

  private val distCacheSql = """
    SELECT n_nationkey, n_name, r_name
    FROM nation JOIN region ON n_regionkey = r_regionkey
    ORDER BY n_nationkey"""

  /** q_obs_metrics — the `Observation` / `df.observe` surface
    * (CollectMetrics operator): named aggregate metrics computed ON
    * the same pass as the real query — zero extra scan, zero extra
    * shuffle — and delivered to the driver with the query result, the
    * declarative twin of q_acc_metrics' imperative accumulator. The
    * observe point sits BEFORE the error filter while the output
    * aggregate sits after, so the metrics see rows the result never
    * does (total row count, error count, total value) — exactly the
    * audit/reconciliation counter a pipeline reports per run. The
    * observed sum runs in exact DECIMAL; the collected metrics are
    * joined onto the per-type output as constant columns. */
  private def obsMetrics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val obs = new org.apache.spark.sql.Observation()
    val observed = Tables.events(spark, dir)
      .observe(obs,
        count(lit(1)).as("n_total"),
        sum(when($"event_type" === "error", 1L).otherwise(0L))
          .as("n_errors"),
        sum(streamline.util.Det.dec("value")).as("sum_value"))
      .where($"event_type" =!= "error")
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
    val kept = observed.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val m = obs.get
    val sumVal = m("sum_value").asInstanceOf[java.math.BigDecimal]
      .doubleValue()
    spark.createDataFrame(kept.map { case (t, n) =>
      (t, n, m("n_total").asInstanceOf[Long],
        m("n_errors").asInstanceOf[Long], sumVal)
    }).toDF("event_type", "n", "n_total", "n_errors", "sum_value")
      .orderBy($"event_type")
  }

  private val obsMetricsSql = """
    WITH m AS (SELECT count(*) AS n_total,
        count(*) FILTER (event_type = 'error') AS n_errors,
        CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM events)
    SELECT e.event_type, count(*) AS n,
      m.n_total, m.n_errors, m.sum_value
    FROM events e, m WHERE e.event_type <> 'error'
    GROUP BY e.event_type, m.n_total, m.n_errors, m.sum_value
    ORDER BY e.event_type"""

  val all: Seq[Q] = Seq(
    Q("q_async_enrich", asyncEnrich _, asyncEnrichSql),
    Q("q_acc_metrics", accMetrics _, accMetricsSql),
    Q("q_obs_metrics", obsMetrics _, obsMetricsSql),
    Q("q_dist_cache", distCache _, distCacheSql))
}
