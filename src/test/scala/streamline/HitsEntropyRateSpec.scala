package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_iter_hits against a literal in-JVM BigInt replay of the 8
  * L1-normalized integer supersteps (independent of both the Spark
  * loop and the oracle's CTE chain), and q_llm_ngram_entropy_rate
  * against a literal bigram walk with the ln-side-table boundary pin
  * (PsiSpec discipline). */
class HitsEntropyRateSpec extends SparkSuite {

  private def r6(num: BigInt, den: BigInt): Double = {
    val mag = (BigInt(2000000) * num.abs + den) / (2 * den)
    (if (num < 0) -mag else mag).toDouble / 1e6
  }

  test("HITS matches a literal BigInt superstep replay") {
    val SCALE = BigInt(1000000000000L)
    val month = Tables.orders(spark, sfDir)
      .where("o_orderdate >= timestamp'1997-03-01' AND " +
        "o_orderdate < timestamp'1997-04-01'")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey").collect()
      .flatMap(r => month.get(r.getLong(0))
        .map(c => (c, r.getLong(1) + 1000000L)))
      .distinct
    val hubsV = edges.map(_._1).distinct
    var h: Map[Long, BigInt] =
      hubsV.map(v => v -> SCALE / hubsV.length).toMap
    var a: Map[Long, BigInt] = Map.empty
    for (_ <- 1 to 8) {
      val araw = edges.groupBy(_._2)
        .map { case (s, es) => s -> es.map(e => h(e._1)).sum }
      val atot = araw.values.sum
      a = araw.map { case (v, raw) => v -> (raw * SCALE) / atot }
      val hraw = edges.groupBy(_._1)
        .map { case (c, es) => c -> es.map(e => a(e._2)).sum }
      val htot = hraw.values.sum
      h = hraw.map { case (v, raw) => v -> (raw * SCALE) / htot }
    }
    val expected =
      (a.toSeq.map { case (v, s) => ("auth", v, s.toLong) } ++
        h.toSeq.map { case (v, s) => ("hub", v, s.toLong) })
        .sortBy(x => (x._1, -x._3, x._2))
    val got = SparkEntry.queries("q_iter_hits")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    // L1 normalization held: each side sums to SCALE minus div dust
    Seq("auth", "hub").foreach { side =>
      val tot = got.filter(_._1 == side).map(x => BigInt(x._3)).sum
      assert((SCALE - tot) >= 0 && (SCALE - tot) < got.length,
        s"$side L1 sum drifted: $tot")
    }
    // mutual reinforcement discriminates: scores are not uniform
    assert(got.filter(_._1 == "auth").map(_._3).distinct.size > 1)
  }

  test("conditional bigram entropy matches a literal walk; L4 safe") {
    val ds = Tables.documents(spark, sfDir).select("lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val bigrams = ds.flatMap { case (lang, text) =>
      val ws = text.split(" ")
      if (ws.length < 2) Seq.empty
      else ws.sliding(2).map(p => (lang, p(0), p(1))).toSeq
    }
    val cb = bigrams.groupBy(identity).map { case (k, xs) =>
      k -> xs.length.toLong }
    val cu = cb.groupBy(x => (x._1._1, x._1._2))
      .map { case (k, m) => k -> m.values.sum }
    val vals = (cb.values ++ cu.values).toSet
    vals.foreach { v =>
      val lx = math.log(v.toDouble) * 10000
      assert(v == 1L || math.abs(lx - math.floor(lx) - 0.5) > 1e-6,
        s"ln($v)*1e4 within 1e-6 of a rounding boundary — oracle unsafe")
    }
    val l4 = vals.map(v =>
      v -> math.round(math.log(v.toDouble) * 10000)).toMap + (1L -> 0L)
    val expected = cb.groupBy(_._1._1).toSeq.map { case (lang, m) =>
      val n = m.values.sum
      val num = m.map { case ((_, w1, _), c) =>
        c * (l4(cu((lang, w1))) - l4(c)) }.sum
      (lang, n, num, r6(BigInt(num), BigInt(n) * 10000))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_llm_ngram_entropy_rate")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === expected)
    // the rate discriminates across languages
    assert(got.map(_._4).distinct.size > 1)
  }
}
