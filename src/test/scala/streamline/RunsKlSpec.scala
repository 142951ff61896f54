package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_agg_runs_test / q_llm_kl_matrix against INDEPENDENT in-JVM
  * brute forces over the collected sf0.001 fixtures: a literal
  * median-split run walk and a literal smoothed 4-term ln-side-table
  * KL replay — so a slipped median rank, an off-by-one run count, or
  * a swapped KL direction cannot cancel against the DuckDB oracle,
  * which shares SQL shape with the queries. */
class RunsKlSpec extends SparkSuite {

  private def r6(num: BigInt, den: BigInt): Double = {
    val mag = (BigInt(2000000) * num.abs + den) / (2 * den)
    (if (num < 0) -mag else mag).toDouble / 1e6
  }

  private def us(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  test("runs test matches a literal median-split run walk") {
    val rows = Tables.events(spark, sfDir)
      .select("event_type", "ts").collect()
      .map(r => (r.getString(0),
        math.floor(us(r.getTimestamp(1)).toDouble / 86400000000.0)
          .toLong))
    val counts = rows.groupBy(identity).map { case (k, xs) =>
      k -> xs.length.toLong }
    val days = counts.keys.map(_._2).toSeq.distinct.sorted
    val expected = counts.keys.map(_._1).toSeq.distinct.sorted.map { t =>
      val xs = days.map(d => counts.getOrElse((t, d), 0L))
      val med = xs.sorted.apply((xs.length + 1) / 2 - 1)
      val signs = xs.filter(_ != med).map(_ > med)
      val n = signs.length.toLong
      val n1 = signs.count(identity).toLong
      val n2 = n - n1
      val r = 1L + signs.sliding(2).count(p =>
        p.length == 2 && p(0) != p(1))
      val ok = n1 > 0 && n2 > 0
      val vNum = BigInt(2) * n1 * n2 * (BigInt(2) * n1 * n2 - n)
      (t, n, n1, n2, r,
        if (!ok) None else Some(r6(BigInt(2 * n1 * n2 + n), BigInt(n))),
        if (!ok || n == 1) None else Some(vNum.toString),
        if (!ok || n == 1) None
        else Some(r6(vNum, BigInt(n) * n * (n - 1))))
    }
    val got = SparkEntry.queries("q_agg_runs_test")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        if (r.isNullAt(6)) None else Some(r.getString(6)),
        if (r.isNullAt(7)) None else Some(r.getDouble(7)))).toSeq
    assert(got === expected)
    // the walk is non-trivial: both sides occur and runs vary by type
    assert(got.forall(x => x._3 > 0 && x._4 > 0))
    assert(got.map(_._5).distinct.size > 1)
  }

  test("source entropy matches a literal lang-mix side-table replay") {
    val docs = Tables.documents(spark, sfDir)
      .select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def l4(x: Long): Long = math.round(math.log(x.toDouble) * 10000)
    val expected = docs.groupBy(_._1).toSeq.map { case (s, xs) =>
      val cs = xs.groupBy(_._2).values.map(_.length.toLong).toSeq
      val n = cs.sum
      val num4 = cs.map(c => c * (l4(n) - l4(c))).sum
      (s, n, cs.length.toLong, num4,
        r6(BigInt(num4), BigInt(n) * 6931))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_llm_source_entropy")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got === expected)
    // mixes genuinely differ and sit inside (0, log2 k]
    assert(got.map(_._5).distinct.size > 1)
    assert(got.forall(x => x._5 > 0 &&
      x._5 <= math.log(x._3.toDouble) / math.log(2.0) + 1e-3))
  }

  test("kl matrix matches a literal smoothed side-table replay") {
    val docs = Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val wc = docs.flatMap { case (s, t) =>
      t.split(" ").filter(_.nonEmpty).map(w => (s, w)) }
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val sources = wc.keys.map(_._1).toSeq.distinct.sorted
    val vocab = wc.keys.map(_._2).toSeq.distinct.sorted
    val v = vocab.length.toLong
    val n = sources.map(s =>
      s -> vocab.map(w => wc.getOrElse((s, w), 0L)).sum).toMap
    def l4(x: Long): Long = math.round(math.log(x.toDouble) * 10000)
    val ld = sources.map(s => s -> vocab.map(w =>
      w -> (l4(wc.getOrElse((s, w), 0L) + 1) - l4(n(s) + v))).toMap)
      .toMap
    val expected = (for {
      a <- sources; b <- sources if a != b
    } yield {
      val num4 = vocab.map(w => BigInt(wc.getOrElse((a, w), 0L) + 1)
        * (ld(a)(w) - ld(b)(w))).sum
      (a, b, num4.toString, r6(num4, BigInt(n(a) + v) * 10000))
    })
    val got = SparkEntry.queries("q_llm_kl_matrix")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), r.getDouble(3))).toSeq
    assert(got === expected)
    // KL is genuinely asymmetric somewhere on the fixture
    val m = got.map(p => (p._1, p._2) -> p._4).toMap
    assert(got.exists(p => m((p._2, p._1)) != p._4))
  }
}
