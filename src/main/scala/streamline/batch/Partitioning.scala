package streamline.batch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import streamline.{Q, Tables}

/** Physical-distribution operators of the reference lineage's DataSet
  * API (upstream `flink-java/.../DataSet.java`: `rebalance()`,
  * `partitionByHash`, `partitionByRange` + `sortPartition`,
  * `mapPartition`, `withBroadcastSet`). These are not logical queries —
  * they pin HOW data is laid out across the cluster, which is exactly
  * what matters at 100 TB. Spark equivalents: `repartition(n)`
  * (round-robin), `repartition(cols)` (hash), `repartitionByRange` +
  * `sortWithinPartitions`, `mapPartitions`, and a driver-side broadcast
  * variable. Each witness's RESULT is partitioning-invariant (that is
  * what makes it oracle-able); the distribution itself is asserted by
  * PartitioningSpec on the physical plan and on per-partition contents.
  */
object Partitioning {

  /** q_partition_hash — partitionByHash + mapPartition: hash
    * partitioning colocates equal keys, so a partition-LOCAL imperative
    * count per key (no further shuffle, no groupBy operator) is already
    * the exact global count — Flink's classic pre-aggregation pattern.
    * One shuffle total; the per-partition map holds one counter per
    * distinct key in the partition. */
  private def partitionHash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"user_id").as[Long]
      .repartition($"user_id")
      .mapPartitions { it =>
        val counts = scala.collection.mutable.LongMap.empty[Long]
        it.foreach(u => counts(u) = counts.getOrElse(u, 0L) + 1L)
        counts.iterator.map { case (u, n) => (u, n) }
      }
      .toDF("user_id", "n_events")
      .orderBy($"user_id")
  }

  private val partitionHashSql = """
    SELECT user_id, count(*) AS n_events
    FROM events GROUP BY user_id ORDER BY user_id"""

  /** q_partition_range — partitionByRange + sortPartition: range
    * partitioning by order date plus a partition-local sort gives
    * globally ordered output without a single-node sort — the
    * distributed sort shape (it is how Spark's own orderBy executes;
    * spelled explicitly here as the DataSet operators compose it).
    * The local sort is verified in-flight: each partition's scan throws
    * on an order violation, so a wrong layout fails loudly rather than
    * silently reordering. */
  private def partitionRange(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderkey", unix_micros($"o_orderdate").as("od_us"))
      .as[(Long, Long)]
      .repartitionByRange(8, $"od_us", $"o_orderkey")
      .sortWithinPartitions($"od_us", $"o_orderkey")
      .mapPartitions { it =>
        var lastOd = Long.MinValue
        var lastKey = Long.MinValue
        it.map { case (key, od) =>
          require(od > lastOd || (od == lastOd && key > lastKey),
            s"partition-local order violated at ($key, $od)")
          lastOd = od; lastKey = key
          (key, od)
        }
      }
      .toDF("o_orderkey", "od_us")
      .select($"o_orderkey",
        timestamp_micros($"od_us").cast("timestamp_ntz").as("o_orderdate"))
      .orderBy($"o_orderdate", $"o_orderkey")
  }

  private val partitionRangeSql = """
    SELECT o_orderkey, o_orderdate FROM orders
    ORDER BY o_orderdate, o_orderkey"""

  /** q_partition_rebalance — rebalance(): round-robin redistribution of
    * a deliberately skewed input (one parquet scan split carries most
    * rows), the cure for skewed file splits before a per-row-expensive
    * map. Content is untouched — the oracle checks that; the even
    * spread and RoundRobinPartitioning node are asserted in the spec. */
  private def partitionRebalance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .where($"event_type" === "purchase")
      .repartition(8)
      .select($"event_id", $"user_id")
      .orderBy($"event_id")
  }

  private val partitionRebalanceSql = """
    SELECT event_id, user_id FROM events
    WHERE event_type = 'purchase' ORDER BY event_id"""

  /** q_broadcast_set — withBroadcastSet: a small computed dataset (per-
    * segment average balance, 5 rows) is collected to the driver and
    * broadcast into a partition-local map over the big side — Flink's
    * broadcast-set pattern (upstream
    * `flink-examples-batch/.../clustering/KMeans.java` broadcasts the
    * centroid set the same way). The broadcast payload is
    * metadata-scale; the big side never shuffles. */
  private def broadcastSet(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val avgBySeg = Tables.customer(spark, dir)
      .groupBy($"c_mktsegment")
      .agg((sum($"c_acctbal".cast("decimal(18,4)")).cast("double") /
        count(lit(1))).as("avg_bal"))
      .as[(String, Double)].collect().toMap
    val bc = spark.sparkContext.broadcast(avgBySeg)
    Tables.customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment", $"c_acctbal")
      .as[(Long, String, Double)]
      .mapPartitions { it =>
        val avgs = bc.value
        it.map { case (k, seg, bal) =>
          (k, seg, if (bal > avgs(seg)) 1 else 0)
        }
      }
      .toDF("c_custkey", "c_mktsegment", "above_avg")
      .orderBy($"c_custkey")
  }

  private val broadcastSetSql = """
    WITH a AS (SELECT c_mktsegment,
                 CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                   / count(*) AS avg_bal
               FROM customer GROUP BY c_mktsegment)
    SELECT c_custkey, c.c_mktsegment AS c_mktsegment,
      CASE WHEN c_acctbal > avg_bal THEN 1 ELSE 0 END AS above_avg
    FROM customer c JOIN a ON c.c_mktsegment = a.c_mktsegment
    ORDER BY c_custkey"""

  /** q_zip_index — DataSetUtils.zipWithIndex: contiguous global ids
    * without a single-node pass. Range-partition + local sort makes
    * partition i's values all precede partition i+1's; `zipWithIndex`
    * then runs one count-per-partition job and one offset-adding pass —
    * the two-pass distributed shape, vs. a global `row_number()` window
    * which plans a SINGLE-partition sort at any scale (the trap this
    * operator exists to avoid). The only RDD use in the codebase:
    * zipWithIndex has no Column-level equivalent. */
  private def zipIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sorted = Tables.documents(spark, dir)
      .select($"doc_id").as[Long]
      .repartitionByRange(8, $"doc_id")
      .sortWithinPartitions($"doc_id")
    sorted.rdd.zipWithIndex()
      .toDF("doc_id", "idx")
      .orderBy($"doc_id")
  }

  private val zipIndexSql = """
    SELECT doc_id,
      row_number() OVER (ORDER BY doc_id) - 1 AS idx
    FROM documents ORDER BY doc_id"""

  /** q_group_sorted — sorted-group reduce (the DataSet API's
    * `groupBy(key).sortGroup(ts).reduceGroup(...)`, the classic
    * secondary sort): hash-repartition on the key colocates each group,
    * `sortWithinPartitions(key, ts, id)` orders WITHIN the shuffle (the
    * sort rides the exchange — no extra pass), and a single
    * forward-only partition scan folds each group in time order. Per
    * task this holds one group accumulator, never a group's rows — the
    * property that distinguishes secondary sort from the
    * `collect_list`+`array_sort` form, which materializes every group
    * in memory and dies on a skewed key at 100 TB. Unique event_id
    * breaks ts ties so the first-3 sequence is deterministic (§2.12).
    * Emits per user: the first 3 event types in time order + total. */
  private def groupSorted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .as[(Long, java.sql.Timestamp, Long, String)]
      .repartition($"user_id")
      .sortWithinPartitions($"user_id", $"ts", $"event_id")
      .mapPartitions { it =>
        // Forward fold over (key-contiguous, time-ordered) rows: emit a
        // group's row when the key changes; O(1) state per group.
        var cur = -1L
        var first3 = List.empty[String]
        var n = 0L
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, String, Long)]
        def flush(): Unit =
          if (cur != -1L) out += ((cur, first3.reverse.mkString(","), n))
        it.foreach { case (u, _, _, tpe) =>
          if (u != cur) { flush(); cur = u; first3 = Nil; n = 0L }
          if (n < 3) first3 ::= tpe
          n += 1L
        }
        flush()
        out.iterator
      }
      .toDF("user_id", "first3", "n_events")
      .orderBy($"user_id")
  }

  private val groupSortedSql = """
    WITH o AS (SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY date_trunc('microseconds', ts), event_id) AS rn
               FROM events)
    SELECT user_id,
      string_agg(CASE WHEN rn <= 3 THEN event_type END, ','
        ORDER BY rn) AS first3,
      count(*) AS n_events
    FROM o GROUP BY user_id ORDER BY user_id"""

  /** q_partition_custom — `partitionCustom` (user-supplied
    * `Partitioner`, upstream `flink-java/.../DataSet.java`): the
    * escape hatch when neither hash nor range routing fits — tenant
    * pinning, locality-aware placement, regulatory data residency.
    * Spark's equivalent lives at the RDD layer (`PairRDD.partitionBy`
    * with a custom `Partitioner` — one of the few sanctioned RDD
    * drops, SURVEY §2.17): customers are routed by an explicit
    * domain rule (nation mod 4 — stand-in for a tenant→shard map),
    * and the emitted partition id proves the routing. The rule is
    * pure and key-deterministic, so the output is partitioning-
    * invariant and fully oracle-able. One shuffle, same cost as any
    * keyed repartition. */
  private def partitionCustom(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nShards = 4
    val routed = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_nationkey").as[(Long, Int)]
      .rdd
      .map { case (ck, nk) => (nk, ck) }
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = nShards
        override def getPartition(key: Any): Int =
          key.asInstanceOf[Int] % nShards
      })
    routed.mapPartitionsWithIndex { (pid, it) =>
      it.map { case (nk, ck) => (pid, nk, ck) }
    }.toDF("shard", "c_nationkey", "c_custkey")
      .orderBy($"shard", $"c_nationkey", $"c_custkey")
  }

  private val partitionCustomSql = """
    SELECT c_nationkey % 4 AS shard, c_nationkey, c_custkey
    FROM customer ORDER BY shard, c_nationkey, c_custkey"""

  /** Confs for the AQE-coalesce witness: the shuffle is forced to start
    * at 64 partitions (the static over-provisioning every production
    * job does — size `shuffle.partitions` for the biggest stage) and
    * `parallelismFirst=false` makes AQE honor the advisory partition
    * size, so the kilobyte-sized sf0.01 reduce outputs collapse to a
    * handful of partitions exactly as multi-GB outputs would collapse
    * under the 64 MB advisory size in production. */
  val coalesceConfs: Seq[(String, String)] = Seq(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> "64")

  /** The coalesce stage, shared with AqeCoalesceSpec (which pins the
    * `AQEShuffleRead coalesced` node and the shrunken partition count
    * in the final adaptive plan). */
  def aqeCoalesceStage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"))
  }

  /** q_part_aqe_coalesce — AQE post-shuffle partition COALESCING, the
    * third of AQE's three big runtime levers next to the skew split
    * (q_join_skew) and the join demotion (q_join_aqe_demote). A static
    * `shuffle.partitions` must be sized for the LARGEST stage of a job,
    * so every smaller stage over-shuffles into mostly-empty reducers —
    * at 1000 executors that is thousands of tiny tasks, each paying
    * scheduler + fetch overhead. AQE measures the real map-output sizes
    * at the stage boundary and merges adjacent undersized partitions up
    * to the advisory size, so reducer count tracks DATA volume, not the
    * static conf. The result is coalescing-invariant (same rows, one
    * reducer fewer-ways merged), which is what makes it oracle-able. */
  private def partAqeCoalesce(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    SkewJoin.withConfs(spark, coalesceConfs) {
      aqeCoalesceStage(spark, dir).localCheckpoint(true)
    }.orderBy($"event_type")
  }

  private val partAqeCoalesceSql = """
    SELECT event_type, count(*) AS n_events,
      count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type"""

  val all: Seq[Q] = Seq(
    Q("q_part_aqe_coalesce", partAqeCoalesce _, partAqeCoalesceSql),
    Q("q_partition_custom", partitionCustom _, partitionCustomSql),
    Q("q_group_sorted", groupSorted _, groupSortedSql),
    Q("q_partition_hash", partitionHash _, partitionHashSql),
    Q("q_partition_range", partitionRange _, partitionRangeSql),
    Q("q_partition_rebalance", partitionRebalance _, partitionRebalanceSql),
    Q("q_broadcast_set", broadcastSet _, broadcastSetSql),
    Q("q_zip_index", zipIndex _, zipIndexSql))
}
