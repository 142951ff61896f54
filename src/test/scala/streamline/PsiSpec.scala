package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_agg_psi against an independent BigDecimal re-derivation over
  * the collected sf0.001 events (literal bucketing and the PSI
  * definition — no window/join algebra shared with the query), plus
  * the boundary-safety pin the libm-free ln-side-table discipline
  * requires (the q_llm_bm25 / q_agg_entropy class). */
class PsiSpec extends SparkSuite {

  test("PSI matches a literal re-derivation; L4 inputs boundary-safe") {
    val rows = Tables.events(spark, sfDir)
      .select("event_type", "ts", "value").collect()
      .map { r =>
        val ts = r.getTimestamp(1)
        // exact µs (getTime truncates to ms — r16 InterpSpec lesson):
        // a borderline event could flip periods on truncated time
        val us = (ts.getTime / 1000) * 1000000L + ts.getNanos / 1000
        (r.getString(0), us, math.round(r.getDouble(2) * 10000))
      }
    val mm = rows.map(_._2).min + rows.map(_._2).max
    val binned = rows.map { case (et, us, v4) =>
      (et, if (2 * us < mm) 0 else 1, math.min(v4 / 1000000, 9))
    }
    val types = binned.map(_._1).distinct.sorted
    def counts(et: String, p: Int): Map[Long, Long] =
      (0L to 9L).map(b =>
        b -> binned.count(x => x._1 == et && x._2 == p && x._3 == b).toLong)
        .toMap
    // boundary safety of every side-table value
    val vals = (for {
      et <- types; p <- Seq(0, 1); b <- 0L to 9L
    } yield counts(et, p)(b) + 1).toSet ++
      types.flatMap(et => Seq(counts(et, 0).values.sum + 10,
        counts(et, 1).values.sum + 10))
    vals.foreach { v =>
      val x = math.log(v.toDouble) * 10000
      val frac = math.abs(x - math.floor(x) - 0.5)
      assert(v == 1L || frac > 1e-6,
        s"ln($v)*1e4 within 1e-6 of a rounding boundary — oracle unsafe")
    }
    val l4 = vals.map(v => v -> math.round(math.log(v.toDouble) * 10000))
      .toMap + (1L -> 0L)
    val expected = types.map { et =>
      val (ca, cb) = (counts(et, 0), counts(et, 1))
      val (na, nb) = (ca.values.sum, cb.values.sum)
      val num = (0L to 9L).map { b =>
        BigInt(ca(b) + 1) * (nb + 10) - BigInt(cb(b) + 1) * (na + 10) match {
          case diff => diff *
            (l4(ca(b) + 1) - l4(na + 10) - l4(cb(b) + 1) + l4(nb + 10))
        }
      }.sum
      val den = BigInt(na + 10) * (nb + 10) * 10000
      val mag = (BigInt(2000000) * num.abs + den) / (2 * den)
      val psi = (if (num < 0) -mag else mag).toDouble / 1e6
      et -> ((na, nb, psi))
    }.toMap
    val got = SparkEntry.queries("q_agg_psi")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === expected)
    // the statistic discriminates and is (numerically) non-negative-ish:
    // exact PSI >= 0; the 4-dp L4 rounding can push it at most ~2e-4 under
    assert(got.values.forall(_._3 > -0.001))
    assert(got.values.map(_._3).toSet.size > 1)
  }
}
