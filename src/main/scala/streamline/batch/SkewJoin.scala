package streamline.batch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import streamline.{Q, Tables}
import streamline.util.Det._

/** §2.3 join-skew handling — the most common 100 TB join failure mode:
  * a power-law fact key sends one reducer 100× the median partition and
  * the whole stage waits on it (the regime the reference lineage's
  * hybrid-hash join degrades gracefully under; Flink 1.x
  * `MutableHashTable` spills the hot bucket, SURVEY.md §2.3).
  *
  * Spark's two answers, one query each:
  *
  *  - **q_join_skew** — AQE runtime skew-split (`OptimizeSkewedJoin`):
  *    the skewed sort-merge join's hot partition is split into
  *    advisory-sized chunks at runtime, each joined against a
  *    replicated copy of the matching dimension partition. Nothing in
  *    the query knows which key is hot — the fix is observed, not
  *    declared. SkewJoinPlanSpec pins that the final adaptive plan
  *    actually ran the join with `skew=true` reads.
  *  - **q_join_salted** — declared salting, the static fallback when
  *    AQE is unavailable (or the skew is in a stateful/streaming path
  *    AQE can't touch): the fact side appends `salt = hash(row) mod S`,
  *    the dimension is replicated S ways with `explode(sequence(...))`,
  *    and the join key becomes (key, salt) — the hot key now spreads
  *    over S reducers by construction, at the cost of an S× dimension
  *    blow-up (fine: dimensions are the small side by definition).
  *    Mirrors q_agg_salted (Aggregates.scala), which treats the same
  *    disease on the aggregation path.
  *
  * Both queries join the same deliberately skewed fact — lineitem with
  * ~75% of rows remapped to one hot part key — and must produce the
  * identical per-brand aggregate as the plain unskewed-oracle SQL.
  * DECIMAL sums keep the result independent of how the hot key's rows
  * split across skew chunks / salts.
  */
object SkewJoin {

  /** ~75% of lineitem rows remapped to part key 1 — the planted
    * power-law key. The remaining 25% keep their real l_partkey, so the
    * dimension join stays total (every key resolves). */
  private def skewedFact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .withColumn("hot_part",
        when(pmod($"l_orderkey", lit(4)) < 3, lit(1L))
          .otherwise($"l_partkey"))
  }

  /** The skewed fact ⋈ dim join under forced shuffle (merge hint +
    * broadcast disabled): the stage OptimizeSkewedJoin must rescue.
    * Exposed for SkewJoinPlanSpec, which asserts `skew=true` in the
    * final adaptive plan.
    *
    * The round-robin repartition ahead of the join is load-bearing for
    * the witness: a skewed reduce partition is split along MAP-output
    * boundaries (PartialReducerPartitionSpec), and the single-row-group
    * harness parquet yields exactly ONE map task — every hot byte in
    * one map output = nothing to split (verified: per-map sizes
    * [0, 47574, 0, 0] → createSkewPartitionSpecs returns None). In
    * production the fact side always arrives from many upstream tasks;
    * the repartition reproduces that multi-mapper reality here. */
  def skewJoinStage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    skewedFact(spark, dir).repartition(16).hint("merge")
      .join(Tables.part(spark, dir), $"hot_part" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_rows"),
        asDouble(sum(dec("l_extendedprice"))).as("sum_price"))
  }

  /** Skew-tuned AQE confs for the witness: local[32] at sf0.01 has
    * kilobyte partitions, so the 256 MB production threshold is scaled
    * down to make the sf0.01 hot partition (a few MB) register as
    * skewed the same way a multi-GB partition would in production —
    * the RATIO test (factor × median) is what fires, exactly as it
    * would at 100 TB with the default thresholds. */
  val skewConfs: Seq[(String, String)] = Seq(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // The post-join partial agg means a skew-split invalidates the
    // join's output partitioning; without force AQE reverts the split
    // to avoid the (already inevitable) extra shuffle.
    "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB")

  /** Run `body` with `confs` set, restoring previous values even on
    * failure. The materialization (localCheckpoint) must happen INSIDE
    * body — a lazily returned plan would execute after restore. */
  def withConfs[T](spark: SparkSession, confs: Seq[(String, String)])
                  (body: => T): T = {
    // Option(...) not Some(...): a conf whose default is undefined
    // (e.g. spark.sql.adaptive.autoBroadcastJoinThreshold) returns
    // null from get instead of throwing, and set(k, null) is illegal —
    // treat it as absent and unset on restore.
    val prev = confs.map { case (k, _) =>
      k -> (try Option(spark.conf.get(k)) catch { case _: Exception => None })
    }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach { case (k, vo) =>
      vo.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  /** q_join_skew — see object doc. The eager localCheckpoint
    * materializes the join while the skew confs are active (the
    * returned frame is lazily executed by the harness, after restore). */
  private def joinSkew(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    withConfs(spark, skewConfs) {
      skewJoinStage(spark, dir).localCheckpoint(true)
    }.orderBy($"p_brand")
  }

  /** q_join_salted — see object doc. S=8 salts; the dimension is
    * replicated 8× (still dimension-sized), the fact's hot key spreads
    * over 8 reducers deterministically. */
  private def joinSalted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nSalt = 8
    val fact = skewedFact(spark, dir)
      .withColumn("salt",
        pmod(hash($"l_orderkey", $"l_linenumber"), lit(nSalt)))
    // hint sits on the DIM side: the hinted side becomes the hash
    // BUILD side, and the build table must be the (replicated but
    // still dimension-sized) side, never the fact
    val dim = Tables.part(spark, dir)
      .withColumn("salt", explode(sequence(lit(0), lit(nSalt - 1))))
      .hint("shuffle_hash")
    fact
      .join(dim, $"hot_part" === $"p_partkey" && fact("salt") === dim("salt"))
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_rows"),
        asDouble(sum(dec("l_extendedprice"))).as("sum_price"))
      .orderBy($"p_brand")
  }

  // One oracle for both: the skew treatment must be invisible in the
  // result. Spark's pmod == SQL % on the positive l_orderkey domain.
  private val skewSql = """
    WITH f AS (SELECT CASE WHEN l_orderkey % 4 < 3 THEN 1
                           ELSE l_partkey END AS hot_part,
                      l_extendedprice
               FROM lineitem)
    SELECT p_brand, count(*) AS n_rows,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        AS sum_price
    FROM f JOIN part ON hot_part = p_partkey
    GROUP BY p_brand ORDER BY p_brand"""

  /** Confs for the AQE join-demotion witness. The regular threshold
    * keeps the STATIC planner on a sort-merge join (a Filter's size
    * estimate equals its child's without CBO stats, so the filtered
    * orders side still "looks" file-sized at plan time); the adaptive
    * threshold lets DynamicJoinSelection demote to a broadcast join
    * once the shuffle map stage reveals the side's true (tiny) size.
    * Byte values are harness-scaled the same way skewConfs are — the
    * production trigger is the same static-vs-runtime size gap. */
  val demoteConfs: Seq[(String, String)] = Seq(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.autoBroadcastJoinThreshold" -> "8KB",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "8KB",
    "spark.sql.adaptive.localShuffleReader.enabled" -> "true")

  /** The demotion stage, shared with AqeDemoteSpec: ~0.1% of orders
    * (an unselective-looking modulus filter no static estimator can
    * price) joined to lineitem. */
  def demoteJoinStage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .where(pmod($"o_orderkey", lit(997)) === 0)
      .join(Tables.lineitem(spark, dir), $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_rows"),
        asDouble(sum(dec("l_extendedprice"))).as("sum_price"))
  }

  /** q_join_aqe_demote — AQE runtime join-strategy demotion (the
    * second of AQE's three big levers, next to the skew split already
    * witnessed): the static plan is a sort-merge join because the
    * filtered side's compile-time size estimate is its full file size,
    * and at runtime the materialized shuffle stage shows ~0.1% of
    * that, so DynamicJoinSelection rewrites the remaining stages to a
    * broadcast join. At 100 TB this is the difference between
    * shuffling the fact table and shipping a few MB — and it needs no
    * stats, no hints, no manual sizing. AqeDemoteSpec pins both ends
    * (initial plan SMJ, final adaptive plan BHJ). */
  private def joinAqeDemote(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    withConfs(spark, demoteConfs) {
      demoteJoinStage(spark, dir).localCheckpoint(true)
    }.orderBy($"o_orderstatus")
  }

  private val aqeDemoteSql = """
    SELECT o_orderstatus, count(*) AS n_rows,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        AS sum_price
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey % 997 = 0
    GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  val all: Seq[Q] = Seq(
    Q("q_join_skew", joinSkew _, skewSql),
    Q("q_join_salted", joinSalted _, skewSql),
    Q("q_join_aqe_demote", joinAqeDemote _, aqeDemoteSql))
}
