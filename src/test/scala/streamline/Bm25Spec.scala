package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_llm_bm25 against an INDEPENDENT in-JVM brute-force BM25 over
  * the collected sf0.001 corpus: same tokenization, same k1/b/idf, but
  * computed with plain Scala collections — no Spark, no SQL — so a bug
  * in the distributed plan (df window scope, len join, decimal cast
  * point) cannot cancel out. Also pins the cross-engine determinism
  * contract: the score column must be DECIMAL(18,4) (exact ordering
  * key), never double.
  */
class Bm25Spec extends SparkSuite {

  private val qterms = Set("query", "join", "window")

  test("top-10 matches an in-JVM brute-force BM25") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val toks = docs.view.mapValues(
      _.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq).toMap
    val lens = toks.view.mapValues(_.size.toLong).toMap
    val nDocs = toks.size.toLong
    val avgdl = lens.values.sum.toDouble / nDocs.toDouble
    val df = qterms.map(t =>
      t -> toks.count { case (_, ts) => ts.contains(t) }.toLong).toMap
    // r15 libm-free discipline: idf is frozen to a 4-dp decimal once
    // per distinct df BEFORE any per-row math (mirrors Text.scala).
    def idfDec(dfT: Long): BigDecimal =
      BigDecimal(math.log((nDocs.toDouble - dfT.toDouble + 0.5)
        / (dfT.toDouble + 0.5) + 1.0))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)
    def contrib(tf: Long, dfT: Long, len: Long): BigDecimal =
      BigDecimal(idfDec(dfT).toDouble
        * (tf.toDouble * 2.2)
        / (tf.toDouble + 1.2 * (0.25 + 0.75 * len.toDouble / avgdl)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val expected = toks.toSeq.flatMap { case (id, ts) =>
      val hits = qterms.toSeq.sorted
        .map(t => t -> ts.count(_ == t).toLong).filter(_._2 > 0)
      if (hits.isEmpty) None
      else Some((id, lens(id), hits.size.toLong,
        hits.map { case (t, tf) => contrib(tf, df(t), lens(id)) }.sum))
    }.sortBy { case (id, _, _, score) => (-score, id) }.take(10)

    val got = SparkEntry.queries("q_llm_bm25")(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        BigDecimal(r.getDecimal(4))))
    assert(got.toSeq === expected,
      s"distributed BM25 diverged from brute force")
  }

  /** The one residual cross-engine surface after the r15 libm-free
    * re-plan: the ≤|Q| distinct-df idf values each evaluate `ln` once
    * before their 4-dp freeze. A 1-ulp libm disagreement only matters
    * if the unrounded value sits within ~1 ulp of a 4-dp rounding
    * boundary — pin that each idf is far (>1e-5 in scaled 4-dp units,
    * ~11 orders of magnitude beyond a 1-ulp disagreement) from its
    * boundary, so any conforming libm rounds identically. */
  test("distinct-df idf values sit far from their 4-dp boundaries") {
    val docs = Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
    val toks = docs.map(_.toLowerCase.split("[^a-z]+").filter(_.nonEmpty))
    val nDocs = toks.length.toDouble
    val dfs = qterms.toSeq.map(t => toks.count(_.contains(t)).toLong)
      .filter(_ > 0).distinct
    assert(dfs.nonEmpty)
    dfs.foreach { df =>
      val raw = math.log((nDocs - df.toDouble + 0.5)
        / (df.toDouble + 0.5) + 1.0)
      val frac = BigDecimal(raw) * 10000
      val dist = (frac - frac.setScale(0, BigDecimal.RoundingMode.HALF_UP))
        .abs
      assert((BigDecimal("0.5") - dist).abs > BigDecimal("1e-5"),
        s"idf(ln) for df=$df is ${dist} from x.5 — too close to a " +
          "4-dp rounding boundary for cross-libm safety")
    }
  }

  test("score is exact decimal(18,4), rank keys contiguous") {
    val out = SparkEntry.queries("q_llm_bm25")(spark, sfDir)
    val scoreType = out.schema("score").dataType.simpleString
    assert(scoreType === "decimal(18,4)", s"score must be exact: $scoreType")
    // the top-k must plan as TakeOrderedAndProject (per-partition heap +
    // driver merge) — a query hitting most of the corpus must NOT sort
    // the whole hit set on one task via an unpartitioned rank window
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "top-10 lost its distributed TakeOrderedAndProject")
    val rows = out.collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to rows.length.toLong))
    val scores = rows.map(r => BigDecimal(r.getDecimal(4)))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "scores must be non-increasing in rank order")
  }
}
