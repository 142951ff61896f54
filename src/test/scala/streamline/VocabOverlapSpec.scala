package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_llm_vocab_overlap against an INDEPENDENT in-JVM brute force
  * — literal per-language bigram Sets over the collected sf0.001
  * documents — so an undeduped gram table (inflating intersections by
  * multiplicity) or a union miscount cannot cancel out. */
class VocabOverlapSpec extends SparkSuite {

  private def r6(num: BigInt, den: BigInt): Double =
    ((BigInt(2000000) * num + den) / (2 * den)).toDouble / 1000000.0

  test("pairwise bigram jaccard matches literal vocabulary sets") {
    val vocab = Tables.documents(spark, sfDir)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (l, ds) =>
        l -> ds.flatMap(_._2.split(" ", -1).toSeq
          .sliding(2).filter(_.length == 2).map(_.mkString(" "))).toSet
      }
    val langs = vocab.keys.toSeq.sorted
    val expected = for {
      i <- langs.indices; j <- (i + 1) until langs.length
      (l1, l2) = (langs(i), langs(j))
      (v1, v2) = (vocab(l1), vocab(l2))
      ni = (v1 intersect v2).size.toLong
      nu = (v1 union v2).size.toLong
    } yield (l1, l2, v1.size.toLong, v2.size.toLong, ni, nu,
      r6(BigInt(ni), BigInt(nu)))
    val got = SparkEntry.queries("q_llm_vocab_overlap")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(got === expected)
    // non-degenerate: overlap high (shared template vocab) but not 1.0
    assert(got.forall(x => x._7 > 0.5 && x._7 < 1.0))
  }
}
