package streamline

import graft.{SparkEntry, SparkSuite}

/** Recall check for the IVF ANN path: probing 4 of 16 k-means cells must
  * still recover most of the exact cosine top-10 (and the top-1 exact
  * neighbor is the probe itself, which always lands in a probed cell).
  * Fixed seeds make this deterministic in CI.
  */
class IvfRecallSpec extends SparkSuite {

  test("q_llm_knn_ivf recalls most of the exact top-10") {
    val exact = SparkEntry.queries("q_llm_knn")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val ivf = SparkEntry.queries("q_llm_knn_ivf")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(ivf.size == 10)
    val recall = exact.intersect(ivf).size
    assert(recall >= 5, s"recall@10 = $recall/10")
    // the probe vector itself (lowest vec_id, cosine 1.0) must be found
    val probeId = Tables.embeddings(spark, sfDir)
      .orderBy(org.apache.spark.sql.functions.col("vec_id").asc)
      .limit(1).collect().head.getLong(0)
    assert(ivf.contains(probeId))
  }
}
