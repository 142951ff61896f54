package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins the r16 statistics batch against INDEPENDENT in-JVM brute
  * forces over the collected sf0.001 corpus — definitions, not the
  * queries' rank/window algebra, so a mis-scoped window or a wrong
  * tie treatment cannot cancel:
  *  - q_agg_auc: literal pair counting P(s⁺>s⁻) + ½P(=) per arm;
  *  - q_agg_mad: sort-and-select median / deviation median;
  *  - q_agg_entropy: BigDecimal re-derivation from the same integer
  *    L₄ table, plus the boundary-safety pin the libm-free discipline
  *    requires (every distinct ln(v)·10⁴ far from its rounding
  *    boundary — the q_llm_bm25 class);
  *  - q_llm_fertility: cross-rollup consistency with the per-doc
  *    q_llm_bpe_encode counts. */
class EntropyAucMadSpec extends SparkSuite {

  private def events() = Tables.events(spark, sfDir)
    .select("user_id", "event_type", "value").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))

  private def r6(num: BigInt, den: BigInt): Double = {
    val mag = (BigInt(2000000) * num.abs + den) / (2 * den)
    (if (num < 0) -mag else mag).toDouble / 1e6
  }

  test("AUC matches literal pair counting per arm") {
    val rows = events()
    val expected = rows.groupBy(_._1 % 4).map { case (arm, rs) =>
      val pos = rs.filter(_._2 == "purchase").map(_._3)
      val neg = rs.filter(_._2 != "purchase").map(_._3)
      val u1x2 = (for (p <- pos; n <- neg) yield
        if (p > n) 2L else if (p == n) 1L else 0L).sum
      arm -> ((neg.length.toLong, pos.length.toLong, BigInt(u1x2),
        r6(BigInt(u1x2), 2 * BigInt(neg.length) * BigInt(pos.length))))
    }
    val got = SparkEntry.queries("q_agg_auc")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        BigInt(r.getString(3)), r.getDouble(4)))).toMap
    assert(got === expected)
    assert(got.size == 4)
  }

  test("MAD matches sort-and-select on scaled integers") {
    val rows = events()
    def sel(xs: Seq[Long]): Long = xs.sorted.apply(((xs.length + 1) / 2) - 1)
    val expected = rows.groupBy(_._2).map { case (et, rs) =>
      val v4 = rs.map(x => math.round(x._3 * 10000)).toSeq
      val med = sel(v4)
      et -> ((v4.length.toLong, med, sel(v4.map(v => math.abs(v - med)))))
    }
    val got = SparkEntry.queries("q_agg_mad")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
    // dispersion must be non-trivial
    assert(got.values.forall(_._3 > 0))
  }

  test("entropy matches a BigDecimal re-derivation; L4 inputs boundary-safe") {
    val rows = events()
    val counts = rows.groupBy(x => (x._1, x._2))
      .map { case (k, rs) => k -> rs.length.toLong }
    val totals = counts.groupBy(_._1._1)
      .map { case (u, cs) => u -> cs.values.sum }
    // the side-table values: every distinct count and total
    val vals = (counts.values ++ totals.values).toSet
    vals.foreach { v =>
      val x = math.log(v.toDouble) * 10000
      val frac = math.abs(x - math.floor(x) - 0.5)
      assert(v == 1L || frac > 1e-6,
        s"ln($v)*1e4 within 1e-6 of a rounding boundary — oracle unsafe")
    }
    val l4 = vals.map(v => v -> math.round(math.log(v.toDouble) * 10000)).toMap
    val expected = totals.map { case (u, n) =>
      val num4 = counts.collect { case ((`u`, _), c) =>
        c * (l4(n) - l4(c))
      }.sum
      val k = counts.count(_._1._1 == u).toLong
      u -> ((n, k, num4, r6(BigInt(num4), BigInt(n) * 6931)))
    }
    val got = SparkEntry.queries("q_agg_entropy")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(got === expected)
    // diversity is real: entropy spread across users, bounded by the
    // QUERY'S log2(5) image — ln(5)·10⁴/6931 ≈ 2.32217, slightly above
    // exact log2(5) because the 4-dp ln2 literal 6931 under-reads
    // 0.69315 (r16 review: the exact bound 2.3219281 could reject a
    // bit-correct uniform-mix user)
    assert(got.values.forall(x => x._4 >= 0.0 && x._4 <= 2.32222))
    assert(got.values.map(_._4).toSet.size > 1)
  }

  test("fertility is consistent with the per-doc bpe_encode rollup") {
    val perDoc = SparkEntry.queries("q_llm_bpe_encode")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    val langs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = perDoc.groupBy(x => langs(x._1)).map { case (lang, ds) =>
      val words = ds.map(_._2._1).sum
      val toks = ds.map(_._2._2).sum
      lang -> ((words, toks, r6(BigInt(toks), BigInt(words))))
    }
    val got = SparkEntry.queries("q_llm_fertility")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === expected)
    // every language's fertility is >= 1 token per word
    assert(got.values.forall(_._3 >= 1.0))
  }
}
