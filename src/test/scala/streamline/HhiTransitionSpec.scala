package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_agg_hhi and q_agg_transition against INDEPENDENT in-JVM
  * brute forces over the collected sf0.001 tables — literal count maps
  * and pair enumeration, with the exact integer HALF_UP rounding
  * re-derived in BigInt — so a wrong share denominator, a lag tie
  * mis-order, or a double-rounded probability cannot cancel out. */
class HhiTransitionSpec extends SparkSuite {

  // the query's exact integer HALF_UP: ⌊(2·10⁶·num + den)/(2·den)⌋
  private def r6(num: BigInt, den: BigInt): Double =
    ((BigInt(2000000) * num + den) / (2 * den)).toDouble / 1000000.0

  test("per-nation HHI matches a literal share-square sum") {
    val cust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_nationkey").collect()
      .map(r => r.getAs[Number](0).longValue ->
        r.getAs[Number](1).longValue).toMap
    val names = Tables.nation(spark, sfDir)
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getAs[Number](0).longValue -> r.getString(1)).toMap
    val orders = Tables.orders(spark, sfDir)
      .select("o_custkey").collect().map(_.getAs[Number](0).longValue)
    val perCust = orders.groupBy(identity).map { case (c, os) =>
      (cust(c), c) -> os.length.toLong
    }
    val expected = perCust.groupBy(_._1._1).map { case (nk, m) =>
      val cs = m.values.toSeq
      val num = cs.map(c => BigInt(c) * BigInt(c)).sum
      val n = cs.map(BigInt(_)).sum
      names(nk) ->
        ((cs.length.toLong, num.toLong, n.toLong, r6(num, n * n)))
    }
    val got = SparkEntry.queries("q_agg_hhi")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got === expected)
    // concentration must discriminate across nations
    assert(got.values.map(_._4).toSet.size > 1)
  }

  test("transition matrix matches literal pair enumeration") {
    val rows = Tables.events(spark, sfDir)
      .select("user_id", "event_type", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime, r.getLong(3)))
    val pairs = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      val seq = rs.sortBy(r => (r._3, r._4)).map(_._2)
      seq.zip(seq.drop(1))
    }
    val counts = pairs.groupBy(identity).map { case (pc, ps) =>
      pc -> ps.length.toLong
    }
    val totals = counts.groupBy(_._1._1).map { case (p, m) =>
      p -> m.values.sum
    }
    val expected = counts.map { case ((p, c), cnt) =>
      (p, c) -> ((cnt, totals(p), r6(BigInt(cnt), BigInt(totals(p)))))
    }
    val got = SparkEntry.queries("q_agg_transition")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got === expected)
    // every row of the matrix sums to ~1 in exact scaled integers:
    // per prev, Σ round6(c/n) differs from 1 by < 5e-6 per cell
    totals.keys.foreach { p =>
      val s = got.collect { case ((`p`, _), (_, _, prob)) => prob }.sum
      assert(math.abs(s - 1.0) < 5e-6 * got.size,
        s"row $p probabilities sum to $s")
    }
  }
}
