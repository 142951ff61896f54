package streamline

import graft.SparkSuite

/** Independent in-JVM oracle for q_llm_bpe_train: a direct Scala
  * implementation of the Sennrich et al. merge loop (greedy
  * left-to-right pair merging over symbol LISTS — no string-replace
  * trick, so a framing bug in the bracketed representation cannot
  * cancel out) compared step-by-step against the operator.
  */
class BpeTrainSpec extends SparkSuite {

  private def mergeGreedy(syms: List[String], l: String, r: String)
      : List[String] = syms match {
    case a :: b :: rest if a == l && b == r =>
      (a + b) :: mergeGreedy(rest, l, r)
    case a :: rest => a :: mergeGreedy(rest, l, r)
    case Nil => Nil
  }

  test("q_llm_bpe_train matches an in-JVM merge loop") {
    val sparkI = graft.SparkTestBase.spark
    import sparkI.implicits._
    val freqs = Tables.documents(spark, sfDir)
      .select($"text").as[String].collect()
      .flatMap(_.split(' '))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    var seqs: Map[List[String], Long] =
      freqs.map { case (w, f) => w.toList.map(_.toString) -> f }
    val want = Seq.newBuilder[(Int, String, String, Long)]
    for (step <- 1 to 10) {
      val pairCnt = collection.mutable.Map.empty[(String, String), Long]
      seqs.foreach { case (s, f) =>
        s.zip(s.drop(1)).foreach { p =>
          pairCnt(p) = pairCnt.getOrElse(p, 0L) + f
        }
      }
      val ((l, r), c) = pairCnt.toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.head
      want += ((step, l, r, c))
      seqs = seqs.groupBy { case (s, _) => mergeGreedy(s, l, r) }
        .map { case (s, m) => s -> m.values.sum }
    }
    val got = graft.SparkEntry.queries("q_llm_bpe_train")(spark, sfDir)
      .collect()
    val expect = want.result()
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (row, (step, l, r, c)) =>
      assert((row.getInt(0), row.getString(1), row.getString(2),
        row.getLong(3)) == ((step, l, r, c)), s"step $step")
    }
    // Non-degenerate: later rounds must merge MULTI-character symbols
    // (the iterative part single-round q_llm_bpe_pairs cannot see).
    assert(expect.exists { case (_, l, r, _) =>
      l.length > 1 || r.length > 1
    })
  }

  test("q_llm_bpe_encode token counts equal the in-JVM encode") {
    val sparkI = graft.SparkTestBase.spark
    import sparkI.implicits._
    val texts = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    // Re-derive the final word -> n_symbols cache with the same
    // symbol-list loop as the train test.
    val freqs = texts.flatMap(_._2.split(' '))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    var seqs: Map[String, List[String]] =
      freqs.keys.map(w => w -> w.toList.map(_.toString)).toMap
    for (_ <- 1 to 10) {
      val pairCnt = collection.mutable.Map.empty[(String, String), Long]
      seqs.foreach { case (w, s) =>
        s.zip(s.drop(1)).foreach { p =>
          pairCnt(p) = pairCnt.getOrElse(p, 0L) + freqs(w)
        }
      }
      if (pairCnt.nonEmpty) {
        val ((l, r), _) = pairCnt.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head
        seqs = seqs.view.mapValues(mergeGreedy(_, l, r)).toMap
      }
    }
    val nSym = seqs.view.mapValues(_.size.toLong).toMap
    val got = graft.SparkEntry.queries("q_llm_bpe_encode")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.size == texts.length)
    texts.foreach { case (id, t) =>
      val ws = t.split(' ')
      val bpe = ws.map(nSym).sum
      val chars = ws.map(_.length.toLong).sum
      val (nw, nb, cpt) = got(id)
      assert(nw == ws.length && nb == bpe, s"doc $id")
      assert(math.abs(cpt - chars.toDouble / bpe) < 1e-6, s"cpt doc $id")
    }
    // Compression must be real: merges shorten at least some docs.
    assert(texts.exists { case (id, t) =>
      got(id)._2 < t.split(' ').map(_.length.toLong).sum
    })
  }
}
