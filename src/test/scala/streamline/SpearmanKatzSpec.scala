package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins the r17 batch-2 additions against INDEPENDENT in-JVM brute
  * forces over the collected sf0.001 fixtures: a literal densified
  * midrank walk + IEEE rho formula (q_agg_spearman), a literal 8-round
  * integer Katz replay over adjacency maps (q_iter_katz), and a
  * literal per-word count-map VMR (q_llm_burstiness) — so a tie-broken
  * rank, a wrong attenuation divisor or a slipped zero-doc cannot
  * cancel against the DuckDB oracle, which shares SQL shape with the
  * queries. */
class SpearmanKatzSpec extends SparkSuite {

  private def r6(num: BigInt, den: BigInt): Double = {
    val mag = (BigInt(2000000) * num.abs + den) / (2 * den)
    (if (num < 0) -mag else mag).toDouble / 1e6
  }

  test("spearman matches literal midranks + the shared IEEE formula") {
    val rows = Tables.events(spark, sfDir)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val users = rows.map(_._1).distinct.sorted
    val types = rows.map(_._2).distinct.sorted
    val cnt = rows.groupBy(identity).map { case (k, xs) =>
      k -> xs.length.toLong }
    // doubled midrank per type over the densified user grid
    val dr = types.map { t =>
      val xs = users.map(u => u -> cnt.getOrElse((u, t), 0L))
      val byC = xs.groupBy(_._2)
      val sorted = xs.map(_._2).sorted
      t -> xs.map { case (u, c) =>
        val minRank = sorted.indexOf(c) + 1L // first position of c
        u -> (2 * minRank + byC(c).length - 1)
      }.toMap
    }.toMap
    val expected = (for {
      (t1, i) <- types.zipWithIndex; t2 <- types.drop(i + 1)
    } yield {
      val (a, b) = (dr(t1), dr(t2))
      val n = users.length
      val sx = users.map(u => BigInt(a(u))).sum.toDouble
      val sy = users.map(u => BigInt(b(u))).sum.toDouble
      val sxy = users.map(u => BigInt(a(u)) * b(u)).sum.toDouble
      val sx2 = users.map(u => BigInt(a(u)) * a(u)).sum.toDouble
      val sy2 = users.map(u => BigInt(b(u)) * b(u)).sum.toDouble
      val dn = n.toDouble
      val rho = (dn * sxy - sx * sy) /
        (math.sqrt(dn * sx2 - sx * sx) * math.sqrt(dn * sy2 - sy * sy))
      (t1, t2, n.toLong, rho)
    })
    val got = SparkEntry.queries("q_agg_spearman")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expected)
    // rank correlation is bounded and non-degenerate on the fixture
    assert(got.forall(p => math.abs(p._4) < 1.0))
    assert(got.map(_._4).distinct.size > 1)
  }

  test("katz matches a literal 8-round integer replay") {
    import java.sql.Timestamp
    val o = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val lo = Timestamp.valueOf("1997-03-01 00:00:00")
    val hi = Timestamp.valueOf("1997-04-01 00:00:00")
    val ordersIn = o.filter(x => !x._3.before(lo) && x._3.before(hi))
      .map(x => x._1 -> x._2).toMap
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.flatMap { case (ok, sk) =>
      ordersIn.get(ok).map(ck => (ck, sk + 1000000L)) }.distinct
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val dmax = edges.groupBy(_._2).values.map(_.length).max
    val inN = edges.groupBy(_._2).map { case (d, es) =>
      d -> es.map(_._1) }
    var x = verts.map(_ -> 1000000L).toMap
    for (_ <- 1 to 8) {
      val xx = x
      x = verts.map { v =>
        val raw = inN.getOrElse(v, Array.empty[Long]).map(xx).sum
        v -> (1000000L + raw / (2L * dmax))
      }.toMap
    }
    val expected = verts.map(v => (v, x(v)))
      .sortBy { case (v, s) => (-s, v) }
    val got = SparkEntry.queries("q_iter_katz")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expected)
    // attenuated paths genuinely differentiate: scores are not flat,
    // and sources (customers, no in-edges) sit at exactly beta
    assert(got.map(_._2).distinct.size > 1)
    assert(got.filter(_._1 < 1000000L).forall(_._2 == 1000000L))
  }

  test("burstiness matches a literal per-word count-map VMR") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = BigInt(docs.length)
    val wc = docs.flatMap { case (d, t) =>
      t.split(" ").filter(_.nonEmpty).map(w => (w, d)) }
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val expected = wc.keys.map(_._1).toSeq.distinct.sorted.map { w =>
      val cs = wc.collect { case ((`w`, _), c) => BigInt(c) }.toSeq
      val tf = cs.sum
      val tf2 = cs.map(c => c * c).sum
      val num = n * tf2 - tf * tf
      val den = n * tf
      val j = math.max(0, den.toString.length - 14)
      val p = BigInt(10).pow(j)
      (w, cs.length.toLong, tf.toLong, num.toString, den.toString,
        r6(num / p, den / p))
    }
    val got = SparkEntry.queries("q_llm_burstiness")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4), r.getDouble(5))).toSeq
    assert(got === expected)
    // the fixture vocabulary genuinely separates: bursty and
    // Poisson-ish words both occur
    assert(got.exists(_._6 > 1.0) && got.map(_._6).distinct.size > 1)
  }
}
