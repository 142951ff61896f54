package streamline

import graft.{SparkEntry, SparkSuite}

/** Pins q_llm_lang_confusion against an INDEPENDENT in-JVM brute
  * force — a literal five-class marker count + strict precedence
  * argmax over the collected sf0.001 documents — so a tiebreak
  * ordering flip or a window-total error in the recall shares cannot
  * cancel out. */
class LangConfusionSpec extends SparkSuite {

  private def r6(num: BigInt, den: BigInt): Double =
    ((BigInt(2000000) * num + den) / (2 * den)).toDouble / 1000000.0

  private val markers = Seq(
    "en" -> Set("order", "window", "table"),
    "de" -> Set("customer", "hash", "big"),
    "es" -> Set("agg", "slow"),
    "fr" -> Set("query", "scan", "data"),
    "zh" -> Set("join", "fast"))

  test("confusion matrix matches a literal argmax walk") {
    val docs = Tables.documents(spark, sfDir)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val guesses = docs.map { case (lang, text) =>
      val ws = text.split(" ", -1)
      val sc = markers.map { case (l, m) => l -> ws.count(m) }.toMap
      // strict precedence: a later class must BEAT every earlier one
      // and at least tie every later one (mirrors the CASE chain)
      val order = Seq("en", "de", "es", "fr", "zh")
      val guessed = order.zipWithIndex.drop(1).collectFirst {
        case (l, i) if order.take(i).forall(e => sc(l) > sc(e)) &&
          order.drop(i + 1).forall(e => sc(l) >= sc(e)) => l
      }.getOrElse("en")
      (lang, guessed)
    }
    val expected = guesses.groupBy(_._1).toSeq.flatMap { case (l, xs) =>
      val n = xs.length.toLong
      xs.groupBy(_._2).toSeq.map { case (g, ys) =>
        (l, g, ys.length.toLong, n, r6(BigInt(ys.length), BigInt(n)),
          if (l == g) 1L else 0L)
      }
    }.sortBy(x => (x._1, x._2))
    val got = SparkEntry.queries("q_llm_lang_confusion")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5))).toSeq
    assert(got === expected)
    // the matrix is genuinely mixed: every label spreads over several
    // guesses (the ~chance verdict this harness exists to deliver)
    assert(got.groupBy(_._1).forall(_._2.length >= 3))
    // and the shares per label sum to 1 exactly in the BigInt algebra
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sum == rows.head._4)
    }
  }
}
