package streamline

import graft.{SparkEntry, SparkSuite}

/** RocksDB state backend witness (SURVEY.md §2.9): the reference
  * lineage keeps keyed state in RocksDB; Spark's equivalent is the
  * `RocksDBStateStoreProvider`. Run the declared stateful query with
  * the provider switched from the default in-memory HDFS-backed store
  * to RocksDB and assert the result is identical — state backend choice
  * is configuration, not semantics.
  */
class RocksDbStateSpec extends SparkSuite {

  private val key = "spark.sql.streaming.stateStore.providerClass"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocks[T](body: => T): T = {
    val before = spark.conf.getOption(key)
    spark.conf.set(key, rocks)
    try body
    finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("q_stream_stateful is identical under the RocksDB state store") {
    val default = SparkEntry.queries("q_stream_stateful")(spark, sfDir)
      .collect().toSeq
    withRocks {
      val viaRocks = SparkEntry.queries("q_stream_stateful")(spark, sfDir)
        .collect().toSeq
      assert(viaRocks == default)
      assert(default.nonEmpty)
    }
  }

  test("the offline state REWRITE is backend-agnostic: statestore " +
      "read + rebuilt checkpoint work under RocksDB") {
    val default = SparkEntry.queries("q_stream_state_rewrite")(spark, sfDir)
      .collect().toSeq
    withRocks {
      val viaRocks = SparkEntry
        .queries("q_stream_state_rewrite")(spark, sfDir).collect().toSeq
      assert(viaRocks == default)
      assert(default.nonEmpty)
      // the migration still lands at the NEW partition count
      assert(viaRocks.forall(_.getAs[Long]("n_state_parts") == 5L))
    }
  }
}
