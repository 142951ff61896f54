package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins the r16 operator batch against independent re-derivations:
  *  - q_join_fuzzy: ALL-PAIRS in-JVM Levenshtein over the collected
  *    name dictionary (no token-index candidates — so an incomplete
  *    candidate generator shows as a missing pair);
  *  - q_win_hampel: literal rolling-window walk per user;
  *  - q_llm_dedup_matrix: cross-query rollup consistency with
  *    q_llm_dedup_jaccard's pair listing + document sources. */
class FuzzyHampelMatrixSpec extends SparkSuite {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("fuzzy join matches an all-pairs Levenshtein brute force") {
    val names = Tables.part(spark, sfDir).select("p_name").collect()
      .map(_.getString(0)).groupBy(identity)
      .map { case (n, xs) => n -> xs.length.toLong }
    val ns = names.keys.toSeq.sorted
    val expected = (for {
      i <- ns.indices; j <- (i + 1) until ns.length
      d = lev(ns(i), ns(j))
      // the query's candidate generator requires a shared token; at
      // k=3 a shared token is implied for these 2-word names, but the
      // brute force applies the SAME declared predicate to compare
      // like for like
      if d <= 3 && ns(i).split(" ").toSet.intersect(
        ns(j).split(" ").toSet).nonEmpty
    } yield (ns(i), ns(j), d.toLong, names(ns(i)), names(ns(j))))
      .sortBy(x => (x._1, x._2))
    val got = SparkEntry.queries("q_join_fuzzy")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === expected)
    assert(got.nonEmpty && got.exists(_._3 < 3))
    // completeness beyond the token filter: on THIS dictionary every
    // lev<=3 pair shares a token, so the candidate filter loses nothing
    val allPairs = (for {
      i <- ns.indices; j <- (i + 1) until ns.length
      if lev(ns(i), ns(j)) <= 3
    } yield (ns(i), ns(j))).toSet
    assert(allPairs == got.map(x => (x._1, x._2)).toSet,
      "token-sharing candidate filter dropped a true lev<=3 pair")
  }

  test("hampel flags match a literal rolling-window walk") {
    val rows = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts", "value").collect()
      .map { r =>
        val ts = r.getTimestamp(2)
        // exact µs (getTime truncates to ms — r16 InterpSpec lesson):
        // the window ORDER is (µs, event_id), so sub-ms order matters
        val us = (ts.getTime / 1000) * 1000000L + ts.getNanos / 1000
        (r.getLong(0), r.getLong(1), us, math.round(r.getDouble(3) * 10000))
      }
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
      val ord = rs.sortBy(x => (x._3, x._2))
      ord.indices.collect {
        case i if i >= 10 && i + 10 < ord.length =>
          val win = (i - 10 to i + 10).map(k => ord(k)._4).sorted
          val med = win(10)
          val mad = win.map(v => math.abs(v - med)).sorted.apply(10)
          (u, ord(i)._2, ord(i)._4, med, mad)
      }.filter(x => 10000L * math.abs(x._3 - x._4) > 44478L * x._5)
    }.sortBy(x => (x._1, x._2))
    val got = SparkEntry.queries("q_win_hampel")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === expected)
    assert(got.nonEmpty, "fixture yields no outliers — filter untested")
  }

  test("dedup matrix is the source rollup of the jaccard pair listing") {
    val pairs = SparkEntry.queries("q_llm_dedup_jaccard")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val src = Tables.documents(spark, sfDir)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = pairs.groupBy { case (a, b, _) =>
      val (sa, sb) = (src(a), src(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.map { case (k, ps) =>
      k -> ((ps.length.toLong, ps.map(p => math.round(p._3 * 1e6)).max))
    }
    val got = SparkEntry.queries("q_llm_dedup_matrix")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }
}
