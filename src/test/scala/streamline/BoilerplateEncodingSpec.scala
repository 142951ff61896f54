package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_llm_boilerplate and q_llm_encoding against in-JVM
  * recomputations over the collected sf0.001 corpus (plain Scala
  * collections — independent of both the distributed line-frequency
  * pass and the DuckDB oracle), and asserts the planted-signal traps:
  * every branch of each screen actually occurs on this corpus.
  */
class BoilerplateEncodingSpec extends SparkSuite {

  /** exactRound6 in plain Long math (num ≥ 0 here). */
  private def round6(num: Long, den: Long): Double =
    ((2000000L * num + den) / (2L * den)) / 1e6

  private def linesOf(id: Long, src: String, text: String): Seq[String] = {
    // limit -1: keep trailing empty tokens, mirroring Spark split
    // and DuckDB string_split exactly (Java's default drops them)
    val ws = text.split(" ", -1).toSeq
    val content = ws.grouped(8).map(_.mkString(" ")).toSeq
    val nav = s"nav $src home about contact"
    val footer = if (id % 3 == 0)
      Seq(s"copyright $src all rights reserved") else Seq.empty
    nav +: content :++ footer
  }

  /** Distinct-doc frequency of every synthesized line (the reference
    * for both the standalone screen and the composed pipeline). */
  private def lineDf(docs: Array[(Long, String, String)]) =
    docs.flatMap { case (id, src, t) =>
      linesOf(id, src, t).distinct.map(_ -> id)
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap

  test("boilerplate line-frequency pass matches a literal recount; " +
    "threshold catches planted chrome AND naturally repeated text") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val df = lineDf(docs)
    val expected = docs.map { case (id, src, t) =>
      val ls = linesOf(id, src, t)
      val kept = ls.filter(l => df(l) <= 4)
      val keptW = kept.map(_.split(" ", -1).length.toLong).sum
      val totW = ls.map(_.split(" ", -1).length.toLong).sum
      (id, ls.size.toLong, kept.size.toLong, keptW,
        round6(totW - keptW, totW))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_llm_boilerplate")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq === expected.toSeq)
    // both branches of the planted signal: the nav chrome is dropped
    // everywhere, yet every doc keeps at least one content line
    assert(got.forall { case (_, nLines, nKept, _, _) => nKept < nLines })
    assert(got.forall(_._3 > 0))
    // the threshold catches REAL repeated text too, not just the
    // planted chrome: some dropped line is neither nav nor footer
    // (short trailing chunks recur across the small-vocabulary corpus)
    val organicDropped = df.exists { case (l, n) =>
      n > 4 && !l.startsWith("nav ") && !l.startsWith("copyright ")
    }
    assert(organicDropped, "no organic boilerplate line on this corpus")
  }

  test("encoding screen matches the planting rule per residue; both " +
    "verdict branches occur") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.map { case (id, t) =>
      val r = id % 4
      (id, if (r == 1) 1L else 0L, if (r == 2) 2L else 0L,
        if (r == 3) 1L else 0L,
        t.length.toLong + (if (r == 3) 1L else 0L),
        if (r == 0) "clean" else "dirty")
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_llm_encoding")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    assert(got.toSeq === expected.toSeq)
    assert(got.exists(_._6 == "clean") && got.exists(_._6 == "dirty"))
    // the fixture text itself is clean ASCII — the screen's zero counts
    // on %4==0 docs are a real negative, not a vacuous one
    assert(docs.forall { case (_, t) =>
      t.forall(c => c >= ' ' && c <= '~') })
  }

  test("pii screen matches the planting rule per residue; masking is " +
    "complete") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.map { case (id, t) =>
      val suffix = (id % 5) match {
        case 1 => " contact [EMAIL]"
        case 2 => " call [PHONE]"
        case 3 => " host [IP]"
        case 4 => " mail [EMAIL] from [IP]"
        case _ => ""
      }
      (id, if (id % 5 == 1 || id % 5 == 4) 1L else 0L,
        if (id % 5 == 2) 1L else 0L,
        if (id % 5 == 3 || id % 5 == 4) 1L else 0L, t + suffix)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_llm_pii")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(got.toSeq === expected.toSeq)
    // every PII form was actually found somewhere (the detector is not
    // vacuously agreeing with an all-zero rule)
    assert(got.exists(_._2 > 0) && got.exists(_._3 > 0) &&
      got.exists(_._4 > 0) && got.exists(r => r._2 == 0 && r._4 == 0))
    // scrub completeness: no masked doc retains an '@' or a digit (the
    // fixture text is digit-free, so any digit would be leaked PII)
    assert(got.forall { case (_, _, _, _, m) =>
      !m.contains('@') && !m.exists(_.isDigit) })
  }

  test("hygiene pipeline funnel matches the literal per-stage recount; " +
    "every stage does real work") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val df = lineDf(docs)
    // per-doc hygiene facts from the synthesis + planting rules (the
    // engine finds them through the real line pass and regex scans;
    // tests above pin detector==rule per doc, this pins the FUNNEL)
    case class D(id: Long, nLines: Long, nKept: Long, keptW: Long,
                 totW: Long, encFatal: Boolean, piiHits: Long)
    val ds = docs.map { case (id, src, t) =>
      val ls = linesOf(id, src, t)
      val kept = ls.filter(l => df(l) <= 4)
      D(id, ls.size.toLong, kept.size.toLong,
        kept.map(_.split(" ", -1).length.toLong).sum,
        ls.map(_.split(" ", -1).length.toLong).sum,
        id % 4 == 1 || id % 4 == 2,
        (id % 5) match { case 4 => 2L; case 0 => 0L; case _ => 1L })
    }
    val surv1 = ds.filter(_.nKept > 0)
    val surv2 = surv1.filterNot(_.encFatal)
    val expected = Seq(
      (1, "boilerplate", ds.length.toLong, surv1.length.toLong,
        ds.map(_.totW).sum, surv1.map(_.keptW).sum,
        ds.map(d => d.nLines - d.nKept).sum),
      (2, "encoding", surv1.length.toLong, surv2.length.toLong,
        surv1.map(_.keptW).sum, surv2.map(_.keptW).sum,
        (surv1.length - surv2.length).toLong),
      (3, "pii", surv2.length.toLong, surv2.length.toLong,
        surv2.map(_.keptW).sum, surv2.map(_.keptW).sum,
        surv2.map(_.piiHits).sum))
    val got = SparkEntry.queries("q_llm_hygiene_pipeline")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === expected)
    // non-degenerate funnel: boilerplate dropped words but no docs,
    // encoding dropped docs, pii flagged hits on survivors
    assert(got(0)._6 < got(0)._5 && got(0)._4 == got(0)._3)
    assert(got(1)._4 < got(1)._3 && got(1)._7 > 0)
    assert(got(2)._7 > 0 && got(2)._4 == got(2)._3)
    // stage chaining: docs_out/words_out of stage N are docs_in/words_in
    // of stage N+1
    assert(got(0)._4 == got(1)._3 && got(1)._4 == got(2)._3)
    assert(got(1)._6 == got(2)._5)
  }
}
