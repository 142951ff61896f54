package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_win_pareto and q_agg_lift against INDEPENDENT in-JVM brute
  * forces over the collected sf0.001 tables — literal sorted walks and
  * a hand-rolled ntile — so a wrong cumsum frame, an off-by-one 80%
  * threshold, or a bucket-boundary tie mishandled by the window cannot
  * cancel out. */
class ParetoLiftSpec extends SparkSuite {

  // the queries' exact integer HALF_UP 6-dp rounding
  private def r6(num: BigInt, den: BigInt): Double =
    ((BigInt(2000000) * num + den) / (2 * den)).toDouble / 1000000.0

  test("pareto k80 and top-1 share match a literal sorted walk") {
    val nat = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_nationkey").collect()
      .map(r => r.getAs[Number](0).longValue ->
        r.getAs[Number](1).longValue).toMap
    val names = Tables.nation(spark, sfDir)
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getAs[Number](0).longValue -> r.getString(1)).toMap
    val spend = Tables.orders(spark, sfDir)
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getAs[Number](0).longValue,
        math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).map { case (c, os) =>
        (nat(c), c) -> os.map(_._2).sum
      }
    val expected = spend.groupBy(_._1._1).map { case (nk, m) =>
      val byCust = m.toSeq.map { case ((_, c), cents) => (c, cents) }
        .sortBy { case (c, cents) => (-cents, c) }
      val tot = byCust.map(x => BigInt(x._2)).sum
      var cum = BigInt(0); var k80 = 0L
      var i = 0
      while (k80 == 0 && i < byCust.length) {
        cum += byCust(i)._2
        if (cum * 5 >= tot * 4) k80 = i + 1
        i += 1
      }
      names(nk) -> ((byCust.length.toLong, k80, tot.toLong,
        r6(BigInt(byCust.head._2), tot)))
    }
    val got = SparkEntry.queries("q_win_pareto")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got === expected)
    // concentration exists: some nation needs fewer than all customers
    assert(got.exists { case (_, (n, k, _, _)) => k < n })
  }

  test("decile lift matches a hand-rolled score-band cut over the user table") {
    val rows = Tables.events(spark, sfDir)
      .select("user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val users = rows.groupBy(_._1).toSeq.map { case (u, rs) =>
      (u, rs.length.toLong,
        if (rs.exists(x => x._2 == "purchase" && x._3 > 95)) 1L else 0L)
    }
    // r18 score-band deciles: every user tied on a score shares the
    // decile of the FIRST tied rank — min(10, 1 + 10·|higher|/n)
    val n = users.length.toLong
    val deciles = users.map { case (_, score, conv) =>
      val above = users.count(_._2 > score).toLong
      (math.min(10L, 1L + above * 10L / n), conv)
    }
    val nu = BigInt(n); val nc = BigInt(deciles.map(_._2).sum)
    val expected = deciles.groupBy(_._1).map { case (d, xs) =>
      val users_d = BigInt(xs.length); val conv_d = BigInt(xs.map(_._2).sum)
      d -> ((xs.length.toLong, conv_d.toLong,
        r6(conv_d, users_d), r6(conv_d * nu, users_d * nc)))
    }
    val got = SparkEntry.queries("q_agg_lift")(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got === expected)
    // non-degenerate: conversion rates vary across deciles
    assert(got.values.map(_._3).toSet.size > 1)
  }

  test("gains curve matches a literal cumulation of the decile walk") {
    val rows = Tables.events(spark, sfDir)
      .select("user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val users = rows.groupBy(_._1).toSeq.map { case (u, rs) =>
      (u, rs.length.toLong,
        if (rs.exists(x => x._2 == "purchase" && x._3 > 95)) 1L else 0L)
    }
    val n = users.length.toLong
    val deciles = users.map { case (_, score, conv) =>
      val above = users.count(_._2 > score).toLong
      (math.min(10L, 1L + above * 10L / n), conv)
    }
    val nc = deciles.map(_._2).sum
    val byDec = deciles.groupBy(_._1)
      .map { case (d, xs) => d -> ((xs.length.toLong, xs.map(_._2).sum)) }
    val expected = byDec.keys.toSeq.sorted.map { d =>
      val cumU = byDec.filter(_._1 <= d).values.map(_._1).sum
      val cumC = byDec.filter(_._1 <= d).values.map(_._2).sum
      (d, cumU, cumC, r6(BigInt(cumU), BigInt(n)),
        r6(BigInt(cumC), BigInt(nc)))
    }
    val got = SparkEntry.queries("q_agg_lift_gains")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got === expected)
    // the curve is a genuine cumulation: strictly increasing, closing
    // at the full population and full capture
    assert(got.last._2 == n && got.last._3 == nc)
    assert(got.last._4 == 1.0 && got.last._5 == 1.0)
    assert(got.sliding(2).forall(p => p(0)._2 < p(1)._2))
  }
}
