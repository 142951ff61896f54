package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_llm_heaps against an INDEPENDENT in-JVM brute force — a
  * literal sequential walk over the sf0.001 documents in doc_id order
  * accumulating vocab sets — so a wrong first-occurrence key, a
  * missed empty-token, or a bigram off-by-one cannot cancel out. */
class HeapsSpec extends SparkSuite {

  test("both gram-order curves match a sequential vocab-set walk") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val seen1 = collection.mutable.Set.empty[String]
    val seen2 = collection.mutable.Set.empty[String]
    var (cum1, cum2) = (0L, 0L)
    val expected = docs.flatMap { case (d, text) =>
      val ws = text.split(" ", -1).toSeq
      val bi = ws.sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")).toSeq
      cum1 += ws.length; cum2 += bi.length
      seen1 ++= ws; seen2 ++= bi
      // a doc with no bigrams has no (2, doc) row (gram-count table
      // semantics); its bigram cumsum is carried by the next doc
      Seq((1L, d, cum1, seen1.size.toLong)) ++
        (if (bi.nonEmpty) Seq((2L, d, cum2, seen2.size.toLong)) else Nil)
    }.sortBy(x => (x._1, x._2))
    val got = SparkEntry.queries("q_llm_heaps")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expected)
    // the Heaps shape: bigram vocab keeps growing long after unigram
    // vocab saturates (the diversity signal the curve exists for)
    val uni = got.filter(_._1 == 1L); val big = got.filter(_._1 == 2L)
    assert(uni.last._4 < big.last._4)
    assert(big(big.length / 2)._4 < big.last._4)
  }
}
