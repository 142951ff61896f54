package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_llm_filter_cascade against an in-JVM recomputation of all
  * four rule bits over the collected sf0.001 corpus (plain Scala
  * collections — independent of the distributed word-frequency pass),
  * and the mask/first_fail consistency contract.
  */
class FilterCascadeSpec extends SparkSuite {

  test("mask matches an in-JVM recomputation; first_fail is lowest bit") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.map { case (id, text) =>
      val ws = text.split(" ").toSeq
      val wf = ws.groupBy(identity).view.mapValues(_.size.toLong)
      val nWords = ws.size.toLong
      val nUniq = wf.size.toLong
      val maxFreq = wf.values.max
      val nWchars = ws.map(_.length.toLong).sum
      val mask = (if (nWords < 60) 1L else 0L) +
        (if (nUniq * 2 < nWords) 2L else 0L) +
        (if (maxFreq * 10 > nWords) 4L else 0L) +
        (if (nWchars < nWords * 4) 8L else 0L)
      (id, nWords, mask)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_llm_filter_cascade")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4)))
    assert(got.map(t => (t._1, t._2, t._3)).toSeq === expected.toSeq)
    got.foreach { case (id, _, mask, pass, firstFail) =>
      assert(pass === (mask == 0L), s"doc $id pass/mask disagree")
      val lowest =
        if (mask == 0L) 0L else java.lang.Long.numberOfTrailingZeros(mask) + 1L
      assert(firstFail === lowest, s"doc $id first_fail $firstFail != $lowest")
    }
    // the cascade must actually discriminate on this corpus (at sf0.001
    // every doc fails ≥1 rule, so distinct MASKS — not pass/fail — are
    // the discrimination witness)
    assert(got.map(_._3).distinct.length > 1)
  }
}
