package streamline

import graft.{SparkEntry, SparkSuite}

/** In-JVM independent oracles for q_agg_hist (§2.4) and q_fn_editdist
  * (§2.8): the histogram is recounted with Scala collections and the
  * edit distances recomputed with a textbook Wagner–Fischer DP —
  * including the threshold-bounded −1 contract — so neither query's
  * correctness rests solely on the DuckDB dialect mirror.
  */
class HistEditDistSpec extends SparkSuite {

  test("q_agg_hist matches a Scala recount (16 equi-width buckets)") {
    val sparkI = graft.SparkTestBase.spark
    import sparkI.implicits._
    val p = Tables.lineitem(spark, sfDir)
      .select($"l_extendedprice").as[Double].collect()
      .map(v => math.round(v * 100)) // same half-up as round(): v > 0
    val lo = p.min; val hi = p.max
    val want = p.groupBy(v => (v - lo) * 16 / (hi - lo + 1)).toSeq
      .map { case (b, vs) =>
        (b, vs.length.toLong, vs.min, vs.max, vs.sum)
      }.sortBy(_._1)
    val got = SparkEntry.queries("q_agg_hist")(spark, sfDir)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == want)
    // every bucket index is in range and the counts cover the table
    assert(got.map(_._1).forall(b => b >= 0 && b < 16))
    assert(got.map(_._2).sum == p.length)
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("q_fn_editdist matches a Wagner–Fischer DP incl. the -1 bound") {
    val sparkI = graft.SparkTestBase.spark
    import sparkI.implicits._
    val rows = Tables.part(spark, sfDir)
      .select($"p_partkey", $"p_name", $"p_brand", $"p_type")
      .as[(Long, String, String, String)].collect().toSeq
    val want = rows.map { case (k, name, brand, typ) =>
      val nt = lev(name, typ)
      (k, nt.toLong, (if (nt > 12) -1 else nt).toLong,
        lev(brand, typ).toLong, brand.length.toLong)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_fn_editdist")(spark, sfDir)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got == want)
    // the bound genuinely fires somewhere (otherwise the -1 branch is
    // vacuous) and agrees with the unbounded column elsewhere
    assert(got.exists(_._3 == -1L) || got.forall(_._2 <= 12L))
    assert(got.filter(_._3 != -1L).forall(r => r._2 == r._3))
  }
}
