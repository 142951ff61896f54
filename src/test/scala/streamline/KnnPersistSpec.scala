package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_llm_knn_persist's persisted-index contract: the parquet
  * index is laid out PARTITIONED BY (band, bkt), a second invocation
  * probes WITHOUT retraining (the `_DONE` marker's mtime is
  * untouched), the probe scan carries partition filters (pruning is
  * the ANN speedup at rest), and the pruned top-10 equals an in-JVM
  * brute force restricted to the probe's bucket candidates. */
class KnnPersistSpec extends SparkSuite {

  private def scratchRoot =
    new java.io.File(streamline.util.Scratch.dir("knnidx", sfDir))

  test("persisted index: layout, no-retrain, pruned probe, results") {
    // fresh build: clear any earlier run's scratch
    stream.Streams.deleteRec(scratchRoot)
    val first = SparkEntry.queries("q_llm_knn_persist")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val done = new java.io.File(scratchRoot, "_DONE")
    assert(done.exists(), "index build left no _DONE marker")
    val builtAt = done.lastModified()
    // layout: hive-style band=/bkt= partition directories
    val bandDirs = new java.io.File(scratchRoot, "index").listFiles()
      .filter(_.getName.startsWith("band="))
    assert(bandDirs.length == 8, s"expected 8 band dirs, ${bandDirs.length}")
    assert(bandDirs.forall(_.listFiles().exists(_.getName.startsWith("bkt="))))
    // second invocation: same answer, NO retrain
    val df2 = SparkEntry.queries("q_llm_knn_persist")(spark, sfDir)
    val second = df2.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(second === first)
    assert(done.lastModified() == builtAt, "second probe retrained the index")
    // the probe scan prunes: its file scan carries partition filters
    val plan = df2.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      (plan.contains("band") && plan.contains("bkt")),
      "probe scan lost its (band, bkt) partition filters")
    // in-JVM brute force over the probe's bucket candidates
    val bits = streamline.util.Knobs.lshBandBits(spark)
    val emb = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    val probe = emb.head._2
    def bkts(v: Array[Float]) = (0 until 8).map(b =>
      (b, (0 until bits).map(i => if (v(b * bits + i) > 0f) 1 << i else 0).sum))
    val pb = bkts(probe).toSet
    val cand = emb.filter { case (_, v) => bkts(v).exists(pb) }
    // replicates CosineSim's exact accumulation and normalization
    // shape (sqrt(nx)·sqrt(ny), NOT sqrt(nx·ny) — last-ulp parity)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = cand
      .map { case (id, v) =>
        (id, BigDecimal(cos(v, probe))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, s) => (-s, id) }.take(10)
    assert(first === expected)
    // pruning is real: the candidate set is a strict subset
    assert(cand.length < emb.length)
  }
}
