package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_agg_ks against an INDEPENDENT in-JVM brute force over the
  * collected sf0.001 events: per event_type, the two-sample KS D is
  * re-derived by literally walking both sorted samples — no windows,
  * no SQL — so a wrong ECDF frame (peers included twice, a tie
  * mis-merge, a cumsum scoped across groups) cannot cancel out.
  * The distributed query emits the exact integer numerator
  * max|n₁·k₀ − n₀·k₁|, so the comparison is integer-exact. */
class KsSpec extends SparkSuite {

  test("per-group KS D matches a sorted-walk brute force") {
    val rows = Tables.events(spark, sfDir)
      .select("event_type", "value", "user_id").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2) % 2))
    val expected = rows.groupBy(_._1).map { case (et, rs) =>
      val a0 = rs.filter(_._3 == 0L).map(_._2).sorted
      val a1 = rs.filter(_._3 == 1L).map(_._2).sorted
      val (n0, n1) = (a0.length.toLong, a1.length.toLong)
      // evaluate |n1*F0 - n0*F1| (common-denominator form) at every
      // distinct observed value across BOTH samples
      // BigInt like the query's DECIMAL(38) carry (r16: the cross-
      // products overflow long at ~3·10⁹ rows per arm)
      val dNum = (a0 ++ a1).distinct.map { v =>
        val k0 = a0.count(_ <= v).toLong
        val k1 = a1.count(_ <= v).toLong
        (BigInt(n1) * k0 - BigInt(n0) * k1).abs
      }.max
      // the query's exact integer HALF_UP: ⌊(2·10⁶·num + den)/(2·den)⌋
      // (BigInt / truncates toward zero = floor for positives), then
      // one exact double division
      val den = BigInt(n0) * BigInt(n1)
      val scaled = (BigInt(2000000) * dNum + den) / (2 * den)
      et -> ((n0, n1, dNum, scaled.toDouble / 1000000.0))
    }
    val got = SparkEntry.queries("q_agg_ks")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          BigInt(r.getString(3)), r.getDouble(4)))).toMap
    assert(got === expected)
    // the statistic must discriminate: not all groups identical D
    assert(got.values.map(_._3).toSet.size > 1)
  }

  test("Mann–Whitney U matches the pair-counting definition") {
    // U₁ = Σ over (x₀, x₁) pairs of [x₁ > x₀] + ½·[x₁ = x₀] — the
    // DEFINITION, computed by literal pair enumeration (doubled to stay
    // integral), fully independent of the query's rank-sum algebra, so
    // a wrong tie-block rank or a mis-scoped cumsum cannot cancel.
    val rows = Tables.events(spark, sfDir)
      .select("event_type", "value", "user_id").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2) % 2))
    val expected = rows.groupBy(_._1).map { case (et, rs) =>
      val a0 = rs.filter(_._3 == 0L).map(_._2)
      val a1 = rs.filter(_._3 == 1L).map(_._2)
      val u1x2 = (for (x0 <- a0; x1 <- a1) yield
        if (x1 > x0) 2L else if (x1 == x0) 1L else 0L).sum
      val den = 2 * BigInt(a0.length) * BigInt(a1.length)
      val scaled = (BigInt(2000000) * u1x2 + den) / (2 * den)
      et -> ((a0.length.toLong, a1.length.toLong, u1x2,
        scaled.toDouble / 1000000.0))
    }
    val got = SparkEntry.queries("q_agg_mannwhitney")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getDouble(5)))).toMap
    assert(got === expected)
  }
}
