package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins the r17 batch-3 operators against independent in-JVM brute
  * forces: a literal per-user covariate walk for q_agg_cuped (BigInt
  * rationals, no shared algebra), a literal diff/trailing-sum walk
  * for q_win_rsi, and a literal train/test stupid-backoff replay for
  * q_llm_backoff_lm with the ln-side-table boundary pin. */
class CupedRsiBackoffSpec extends SparkSuite {

  private def r6(num: BigInt, den: BigInt): Double = {
    val mag = (BigInt(2000000) * num.abs + den) / (2 * den)
    (if (num < 0) -mag else mag).toDouble / 1e6
  }

  private def us(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  test("CUPED adjusted means match a literal covariate walk") {
    val rows = Tables.events(spark, sfDir).select("user_id", "ts")
      .collect().map(r => (r.getLong(0), us(r.getTimestamp(1))))
    val mm = rows.map(_._2).min + rows.map(_._2).max
    val u = rows.groupBy(_._1).toSeq.map { case (uid, xs) =>
      (uid % 2, BigInt(xs.count(_._2 * 2 < mm)),
        BigInt(xs.count(_._2 * 2 >= mm)))
    }
    val n = BigInt(u.size)
    val sx = u.map(_._2).sum; val sy = u.map(_._3).sum
    val sxx = u.map(x => x._2 * x._2).sum
    val sxy = u.map(x => x._2 * x._3).sum
    val tnum = n * sxy - sx * sy; val tden = n * sxx - sx * sx
    val expected = u.groupBy(_._1).toSeq.map { case (arm, xs) =>
      val nA = BigInt(xs.size)
      val sxA = xs.map(_._2).sum; val syA = xs.map(_._3).sum
      val num = syA * tden * n - tnum * (sxA * n - sx * nA)
      val den = nA * tden * n
      (arm, xs.size.toLong, sxA.toLong, syA.toLong, r6(tnum, tden),
        num.toString, den.toString, r6(num, den))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_agg_cuped")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(5), r.getString(6),
        r.getDouble(7))).toSeq
    assert(got === expected)
    // the adjustment bites: adjusted mean != raw mean on some arm
    assert(got.exists { case (_, nA, _, syA, _, _, _, adj) =>
      math.abs(adj - syA.toDouble / nA) > 1e-9 })
  }

  test("RSI matches a literal diff/trailing-sum walk") {
    val rows = Tables.events(spark, sfDir).select("event_type", "ts")
      .collect().map(r => (r.getString(0),
        math.floor(us(r.getTimestamp(1)).toDouble / 86400000000.0).toLong))
    val counts = rows.groupBy(identity)
      .map { case (k, xs) => k -> xs.length.toLong }
    val days = rows.map(_._2).distinct.sorted
    val expected = rows.map(_._1).distinct.sorted.flatMap { t =>
      val c = days.map(d => counts.getOrElse((t, d), 0L))
      val d = c.indices.map(i => if (i == 0) 0L else c(i) - c(i - 1))
      days.indices.collect { case i if i >= 14 =>
        val g = (i - 13 to i).map(j => math.max(d(j), 0L)).sum
        val l = (i - 13 to i).map(j => math.max(-d(j), 0L)).sum
        (t, days(i), g, l,
          if (g + l == 0) null
          else java.lang.Double.valueOf(r6(BigInt(100) * g, BigInt(g + l))))
      }
    }
    val got = SparkEntry.queries("q_win_rsi")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) null
        else java.lang.Double.valueOf(r.getDouble(4)))).toSeq
    assert(got === expected)
    // momentum swings both ways on the fixture
    assert(got.exists(x => x._5 != null && x._5.doubleValue > 50.0) &&
      got.exists(x => x._5 != null && x._5.doubleValue < 50.0))
  }

  test("stupid backoff matches a literal held-out replay; L4 safe") {
    val ds = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ")))
    def bigrams(p: (Long, String, Array[String]) => Boolean) =
      ds.filter(x => p(x._1, x._2, x._3)).flatMap { case (_, lang, ws) =>
        if (ws.length < 2) Seq.empty
        else ws.sliding(2).map(a => (lang, a(0), a(1))).toSeq
      }
    val c12 = bigrams((id, _, _) => id % 2 == 0).groupBy(identity)
      .map { case (k, xs) => k -> xs.length.toLong }
    val c1 = c12.groupBy(x => (x._1._1, x._1._2))
      .map { case (k, m) => k -> m.values.sum }
    val cu = ds.filter(_._1 % 2 == 0)
      .flatMap { case (_, lang, ws) => ws.map(wd => (lang, wd)) }
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val nn = cu.groupBy(_._1._1).map { case (k, m) => k -> m.values.sum }
    val vals = (c12.values ++ c1.values ++ cu.values ++ nn.values).toSet
    vals.foreach { v =>
      val lx = math.log(v.toDouble) * 10000
      assert(v == 1L || math.abs(lx - math.floor(lx) - 0.5) > 1e-6,
        s"ln($v)*1e4 within 1e-6 of a rounding boundary — oracle unsafe")
    }
    val l4 = vals.map(v =>
      v -> math.round(math.log(v.toDouble) * 10000)).toMap + (1L -> 0L)
    val LAM = -9163L
    val expected = bigrams((id, _, _) => id % 2 == 1)
      .map { case (lang, w1, w2) =>
        val s4 =
          if (c12.contains((lang, w1, w2)))
            l4(c12((lang, w1, w2))) - l4(c1((lang, w1)))
          else if (cu.contains((lang, w2)))
            LAM + l4(cu((lang, w2))) - l4(nn(lang))
          else 2 * LAM - l4(nn(lang))
        val cls = if (c12.contains((lang, w1, w2))) "seen"
          else if (cu.contains((lang, w2))) "backoff" else "oov"
        (lang, cls, s4)
      }.groupBy(_._1).toSeq.map { case (lang, xs) =>
        val score = xs.map(_._3).sum
        (lang, xs.length.toLong, xs.count(_._2 == "seen").toLong,
          xs.count(_._2 == "backoff").toLong,
          xs.count(_._2 == "oov").toLong, score,
          r6(BigInt(score), BigInt(xs.length) * 10000))
      }.sortBy(_._1)
    val got = SparkEntry.queries("q_llm_backoff_lm")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(got === expected)
    // the held-out split genuinely exercises the backoff path
    assert(got.forall(_._4 > 0L))
  }
}
