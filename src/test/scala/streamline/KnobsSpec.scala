package streamline

import graft.{SparkEntry, SparkSuite}
import streamline.util.{Knobs, Scratch}

/** Cluster-size knobs flow from spark conf (SURVEY.md §2.12): defaults
  * hold without conf, conf overrides take effect, and the one knob
  * with a result-visible surface (dedup blocks) leaves the result
  * unchanged — B partitions the work, never the answer. */
class KnobsSpec extends SparkSuite {

  test("knob defaults") {
    spark.conf.unset("graft.dedup.blocks")
    spark.conf.unset("graft.bucket.count")
    spark.conf.unset("graft.stream.statePartitions")
    spark.conf.unset("graft.iter.partitions")
    spark.conf.unset("graft.iter.aqe")
    assert(Knobs.dedupBlocks(spark) == 8)
    assert(Knobs.bucketCount(spark) == 8)
    assert(Knobs.statePartitions(spark) == 4)
    // iteration loops default to min(8, session shuffle partitions)
    // and AQE off (fixed plan shape, per-superstep replan is latency)
    assert(Knobs.iterPartitions(spark) ==
      math.min(8, spark.conf.get("spark.sql.shuffle.partitions").toInt))
    assert(!Knobs.iterAqe(spark))
  }

  test("conf overrides reach the accessors") {
    try {
      spark.conf.set("graft.dedup.blocks", "3")
      spark.conf.set("graft.bucket.count", "16")
      spark.conf.set("graft.stream.statePartitions", "2")
      spark.conf.set("graft.iter.partitions", "64")
      spark.conf.set("graft.iter.aqe", "true")
      assert(Knobs.dedupBlocks(spark) == 3)
      assert(Knobs.bucketCount(spark) == 16)
      assert(Knobs.statePartitions(spark) == 2)
      assert(Knobs.iterPartitions(spark) == 64)
      assert(Knobs.iterAqe(spark))
    } finally {
      spark.conf.unset("graft.dedup.blocks")
      spark.conf.unset("graft.bucket.count")
      spark.conf.unset("graft.stream.statePartitions")
      spark.conf.unset("graft.iter.partitions")
      spark.conf.unset("graft.iter.aqe")
    }
  }

  test("dedup_embed result is independent of the block count") {
    val q = SparkEntry.queries("q_llm_dedup_embed")
    val base = q(spark, sfDir).collect().map(_.toSeq).toSet
    try {
      spark.conf.set("graft.dedup.blocks", "3")
      assert(q(spark, sfDir).collect().map(_.toSeq).toSet == base)
    } finally spark.conf.unset("graft.dedup.blocks")
    assert(base.nonEmpty || q(spark, sfDir).count() == 0)
  }

  test("streaming result is independent of the state-partition count") {
    // graft.stream.statePartitions sizes the state store to the
    // cluster; it must never reach the answer. Witnessed on the
    // checkpoint-recovery query — the most state-machinery-heavy flow
    // (two runs, restore, foreachBatch) — at 2 vs the default 4.
    val q = SparkEntry.queries("q_stream_recovery")
    val base = q(spark, sfDir).collect().map(_.toSeq).toSet
    assert(base.nonEmpty)
    try {
      spark.conf.set("graft.stream.statePartitions", "2")
      assert(q(spark, sfDir).collect().map(_.toSeq).toSet == base)
    } finally spark.conf.unset("graft.stream.statePartitions")
  }

  test("scratch paths encode the source dir") {
    val a = Scratch.dir("x", "/root/testdata/sf0.01")
    val b = Scratch.dir("x", "/root/testdata/sf0.1")
    assert(a != b)
    assert(a.contains("graft_x_"))
  }

  test("fast-tmp auto-pick guards tmpfs headroom") {
    // tmpfs is RAM — the auto-pick must refuse /dev/shm when its free
    // space is under the floor (fallback to java.io.tmpdir) and accept
    // it when above; a missing/unwritable dir also falls back.
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) {
      assert(Knobs.pickFastTmp(shm, 1L) == Some("/dev/shm/graft"))
      assert(Knobs.pickFastTmp(shm, Long.MaxValue).isEmpty)
    }
    assert(Knobs.pickFastTmp(new java.io.File("/nonexistent_graft"), 1L)
      .isEmpty)
  }

  test("scratch roots at the fast ephemeral dir") {
    // The explicit per-witness scratch (sink rewrites, staged sources,
    // checkpointLocation roots) must share Bench's fast-tmp posture —
    // a regression back to bare java.io.tmpdir puts every staged write
    // and state checkpoint back on the throttled block device.
    assert(Scratch.root == Knobs.fastTmp)
    assert(Scratch.dir("x", "/d").startsWith(Knobs.fastTmp + "/"))
  }
}
