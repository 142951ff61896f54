package streamline

import graft.{SparkEntry, SparkSuite}

/** In-JVM independent oracles for the §2.11 vocabulary/LM operators
  * (llm/Vocab.scala): each query is recomputed from the collected
  * fixture with plain Scala collections — a different algorithm and
  * substrate than the DataFrame plans — and compared exactly. The
  * fixture is 500 docs, so the collected recomputation is test-only by
  * construction. A synthetic frame exercises the hapax rule the dense
  * fixture vocabulary never fires.
  */
class VocabSpec extends SparkSuite {

  private def docs: Seq[(Long, String, Array[String])] = {
    val sparkI = graft.SparkTestBase.spark
    import sparkI.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang", $"text").as[(Long, String, String)]
      .collect().toSeq
      .map { case (id, lang, t) =>
        (id, lang, t.split(' ').filter(_.nonEmpty))
      }
  }

  test("q_llm_ngram_lm matches a Scala trigram recount") {
    val tri = docs.flatMap(_._3.sliding(3).filter(_.length == 3))
      .map(w => (w(0), w(1), w(2)))
    val c3 = tri.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c2 = tri.groupBy(t => (t._1, t._2)).view
      .mapValues(_.size.toLong).toMap
    val want = c3.toSeq.collect {
      case ((a, b, c), n3) if n3 >= 3 =>
        val n2 = c2((a, b))
        (a, b, c, n3, n2,
          BigDecimal(n3.toDouble / n2.toDouble)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (a, b, c, n3, _, _) => (-n3, a, b, c) }.take(200)
    val got = SparkEntry.queries("q_llm_ngram_lm")(spark, sfDir)
      .collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got == want)
  }

  test("q_llm_df_prune matches a Scala df filter + rebuild") {
    val n = docs.size
    val df = docs.flatMap { case (id, _, w) => w.distinct.map((_, id)) }
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    def keep(t: String): Boolean = df(t) * 100 <= 78L * n && df(t) >= 2
    val want = docs.map { case (id, _, w) =>
      val k = w.filter(keep)
      (id, w.length.toLong, k.length.toLong, k.mkString(" "))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_llm_df_prune")(spark, sfDir)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got == want)
  }

  test("q_llm_df_prune hapax rule fires on a synthetic corpus") {
    val sparkI = graft.SparkTestBase.spark
    import sparkI.implicits._
    // 10 docs sharing common tokens; 'rare' appears in exactly one doc
    // (hapax, df=1 < 2 → dropped) and 'dup' in two (kept); 'stop' is in
    // all 10 (df·100 = 1000 > 78·10 → dropped as a stopword).
    val tmp = java.nio.file.Files
      .createTempDirectory("vocab_hapax").toString
    try {
      (0 until 10).map { i =>
        val extra = if (i == 0) " rare" else if (i <= 2) " dup" else ""
        (i.toLong, s"stop mid$extra", "en", "s", 0L)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$tmp/documents.parquet")
      val got = SparkEntry.queries("q_llm_df_prune")(spark, tmp)
        .collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3)))
      // 'mid' has df=10 > 7.8 → also a stopword; only 'dup' (df=2) stays.
      val want = (0 until 10).map { i =>
        val nTok = if (i == 0 || (i >= 1 && i <= 2)) 3L else 2L
        val kept = if (i >= 1 && i <= 2) "dup" else ""
        (i.toLong, nTok, if (kept.isEmpty) 0L else 1L, kept)
      }
      assert(got == want)
    } finally {
      streamline.stream.Streams.deleteRec(new java.io.File(tmp))
    }
  }

  test("q_llm_ppl_bucket tiers are per-lang terciles of the LM score") {
    val scores = SparkEntry.queries("q_llm_bigram_lm")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val byLang = docs.groupBy(_._2)
    val want = byLang.flatMap { case (lang, ds) =>
      val ranked = ds.map(d => (d._1, scores(d._1)))
        .sortBy { case (id, s) => (-s, id) }
      val n = ranked.size
      ranked.zipWithIndex.map { case ((id, s), i) =>
        // SQL ntile(3): first (n mod 3) buckets get ceil(n/3) rows.
        val base = n / 3; val rem = n % 3
        val bucket =
          if (i < (base + 1) * rem) i / (base + 1) + 1
          else (i - rem) / base + 1
        (id, lang, s, bucket.toLong)
      }
    }.toSeq.sortBy { case (id, lang, _, b) => (lang, b, id) }
    val got = SparkEntry.queries("q_llm_ppl_bucket")(spark, sfDir)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3)))
    assert(got == want)
    // tier labels line up with bucket ids
    val tiers = SparkEntry.queries("q_llm_ppl_bucket")(spark, sfDir)
      .collect().map(r => r.getLong(3) -> r.getString(4)).distinct.sorted
    assert(tiers.toSeq == Seq(1L -> "head", 2L -> "middle", 3L -> "tail"))
  }
}
