package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_stream_rocksdb beyond its (shared) recovery oracle:
  *  1. RESULT equality with the default-provider drain — the RocksDB
  *     path must recover the identical closed windows through the
  *     same stop→restart, or snapshot upload / restore is broken.
  *  2. ARTIFACT identity — the checkpoint's state dir must hold
  *     RocksDB snapshot zips, not the default provider's `.delta`
  *     files, so the row cannot silently green on a provider conf
  *     that never took effect (the recovery scratch root survives
  *     the run; only the NEXT run clears it).
  *  3. Conf hygiene — the provider override must not leak into the
  *     session after the drain (every later streaming witness would
  *     silently switch backends). */
class RocksdbWitnessSpec extends SparkSuite {

  private def stateFileNames(tag: String): Seq[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(
      streamline.util.Scratch.dir(tag, sfDir) + "/ck/state")).map(_.getName)
  }

  test("rocksdb recovery drain: result equality, rocksdb artifacts, no conf leak") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(providerKey)
    val hdfs = SparkEntry.queries("q_stream_recovery")(spark, sfDir)
      .collect().toSeq
    val rocks = SparkEntry.queries("q_stream_rocksdb")(spark, sfDir)
      .collect().toSeq
    assert(rocks.nonEmpty && rocks == hdfs,
      "RocksDB drain must emit the identical closed windows")
    // provider actually engaged: RocksDB checkpoints state as
    // <version>.zip snapshots (+ optional changelogs); the default
    // provider writes <version>.delta
    val rockFiles = stateFileNames("rocksdb")
    val hdfsFiles = stateFileNames("recov")
    assert(rockFiles.exists(_.endsWith(".zip")) &&
      !rockFiles.exists(_.endsWith(".delta")),
      s"expected RocksDB zip snapshots in the state dir, got: $rockFiles")
    assert(hdfsFiles.exists(_.endsWith(".delta")),
      s"default provider must write .delta files, got: $hdfsFiles")
    assert(spark.conf.getOption(providerKey) == before,
      "provider override leaked out of the drain")
  }

  test("offline state reader over a RocksDB checkpoint: equality + artifacts") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(providerKey)
    val hdfs = SparkEntry.queries("q_stream_state_reader")(spark, sfDir)
      .collect().toSeq
    val rocks = SparkEntry.queries("q_stream_rocksdb_reader")(spark, sfDir)
      .collect().toSeq
    assert(rocks.nonEmpty && rocks == hdfs,
      "statestore read of a RocksDB checkpoint must surface the " +
        "identical open windows")
    val rockFiles = stateFileNames("rocksreader")
    assert(rockFiles.exists(_.endsWith(".zip")) &&
      !rockFiles.exists(_.endsWith(".delta")),
      s"expected RocksDB zip snapshots, got: $rockFiles")
    assert(spark.conf.getOption(providerKey) == before,
      "provider override leaked out of the reader drain")
  }
}
