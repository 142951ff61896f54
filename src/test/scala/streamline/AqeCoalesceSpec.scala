package streamline

import graft.SparkSuite
import streamline.batch.{Partitioning, SkewJoin}

/** Pins the q_part_aqe_coalesce witness: the shuffle starts at the
  * static 64 partitions and the FINAL adaptive plan must read it back
  * through a coalesced AQEShuffleRead with far fewer partitions — a
  * green correctness row alone would also pass with coalescing
  * silently not firing (the result is coalescing-invariant by
  * construction).
  */
class AqeCoalesceSpec extends SparkSuite {

  test("AQE coalesces the 64-way shuffle down to data-sized partitions") {
    SkewJoin.withConfs(spark, Partitioning.coalesceConfs) {
      val df = Partitioning.aqeCoalesceStage(spark, sfDir)
      df.collect() // materialize: AQE finalizes the adaptive plan
      val whole = df.queryExecution.executedPlan.toString
      assert(whole.contains("isFinalPlan=true"), whole.take(300))
      val fin = whole.split("== Initial Plan ==").head
      assert(fin.contains("AQEShuffleRead coalesced"),
        s"no coalesced shuffle read in the final plan:\n$fin")
      val n = df.rdd.getNumPartitions
      assert(n < 64, s"expected far fewer than the static 64 " +
        s"partitions after coalescing, got $n")
    }
  }
}
