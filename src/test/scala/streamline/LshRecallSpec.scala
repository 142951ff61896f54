package streamline

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** Candidate-recall check for the native random-projection LSH
  * (llm/Similarity.scala q_llm_knn_lsh): a vector and a slightly
  * perturbed copy project to nearly identical values, so with two hash
  * tables at bucket length 0.25 a planted near-identical pair must
  * collide in at least one table and appear in the output pair set.
  * Also pins the candidate filter: every emitted pair is within the
  * distance threshold, ordered, and deduplicated. */
class LshRecallSpec extends SparkSuite {

  test("q_llm_knn_lsh emits planted and self-evident near pairs, deduped") {
    val out = SparkEntry.queries("q_llm_knn_lsh")(spark, sfDir)
      .collect()
    assert(out.nonEmpty, "LSH found no near pairs at all")
    // dist bound respected and pairs canonical + unique
    val pairs = out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.forall { case (a, b, d) => a < b && d <= 1.1 })
    assert(pairs.map(p => (p._1, p._2)).distinct.length == pairs.length)
  }

  test("every strongly-near exact pair is recalled by the bucket join") {
    // brute force on the small fixture: pairs at euclidean ≤ 0.5
    // project within 0.5/0.25 = 2 buckets of each other per table and
    // in practice collide in at least one of the two tables — assert
    // total recall of the strongly-near set, the property that makes
    // LSH a usable candidate generator.
    val sparkI = graft.SparkTestBase.spark
    import sparkI.implicits._
    val vecs = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect()
    val strong = for {
      (ia, va) <- vecs; (ib, vb) <- vecs if ia < ib
      d = math.sqrt(va.zip(vb).map { case (x, y) =>
        (x - y).toDouble * (x - y) }.sum)
      if d <= 0.5
    } yield (ia, ib)
    val lshPairs = SparkEntry.queries("q_llm_knn_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = strong.filterNot(lshPairs)
    assert(missed.isEmpty,
      s"${missed.length}/${strong.length} strongly-near pairs missed: " +
        missed.take(5).mkString(", "))
  }
}
