package streamline

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Physical-distribution witnesses for the DataSet partitioning
  * operators (batch/Partitioning.scala): the oracle checks only the
  * partitioning-invariant CONTENT, so the distribution properties —
  * which exchange node runs, whether keys colocate, whether round-robin
  * spreads evenly, whether range partitions are disjoint — are pinned
  * here on the physical plan and on per-partition contents. */
class PartitioningSpec extends SparkSuite {

  val sparkI = graft.SparkTestBase.spark
  import sparkI.implicits._

  test("repartition(col) plans a hashpartitioning exchange and colocates keys") {
    val df = spark.range(0, 1000).select(($"id" % 37).as("k"))
      .repartition($"k")
    assert(df.queryExecution.executedPlan.toString.contains("hashpartitioning"))
    // every key lives in exactly one partition
    val spread = df.withColumn("pid", spark_partition_id())
      .groupBy($"k").agg(countDistinct($"pid").as("nparts"))
      .agg(max($"nparts")).as[Long].head()
    assert(spread == 1L)
  }

  test("repartition(n) plans round-robin and spreads a skewed input evenly") {
    val skewed = spark.range(0, 10000).select(lit(1L).as("k"))
      .coalesce(1) // all rows in ONE input partition
      .repartition(8)
    assert(skewed.queryExecution.executedPlan.toString
      .contains("REPARTITION_BY_NUM"))
    val sizes = skewed.withColumn("pid", spark_partition_id())
      .groupBy($"pid").count().select($"count").as[Long].collect()
    assert(sizes.length == 8)
    // round-robin distributes within a couple of rows per partition
    // (each task's cursor starts at a random offset, so exact equality
    // is not guaranteed — near-uniformity is the contract)
    assert(sizes.max - sizes.min <= 8, sizes.toSeq.toString)
  }

  test("repartitionByRange plans rangepartitioning with disjoint partition ranges") {
    val df = spark.range(0, 10000).select(($"id" * 7919 % 10000).as("k"))
      .repartitionByRange(8, $"k")
    assert(df.queryExecution.executedPlan.toString.contains("rangepartitioning"))
    val ranges = df.withColumn("pid", spark_partition_id())
      .groupBy($"pid").agg(min($"k").as("lo"), max($"k").as("hi"))
      .orderBy($"lo")
      .as[(Int, Long, Long)].collect()
    // consecutive partitions cover disjoint, increasing ranges
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2)
      case _ => ()
    }
  }

  test("a wrong local order inside q_partition_range's scan fails loudly") {
    // the in-flight require: feeding an UNSORTED partition through the
    // same check must throw, proving the witness actually verifies
    val ex = intercept[org.apache.spark.SparkException] {
      spark.range(0, 100).select(($"id" % 7).as("a"), $"id".as("b"))
        .as[(Long, Long)]
        .mapPartitions { it =>
          var last = Long.MinValue
          it.map { case (a, b) =>
            require(a >= last, "order violated"); last = a; (a, b)
          }
        }.count()
    }
    assert(ex.getMessage.contains("order violated") ||
      ex.getCause != null)
  }
}
