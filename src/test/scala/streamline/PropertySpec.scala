package streamline

import java.nio.file.Files

import graft.{SparkEntry, SparkSuite}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import streamline.llm.Simhash

/** Property tests (SURVEY.md §5.2): invariants the DuckDB oracle cannot
  * express, checked against brute-force references over GENERATED
  * corpora — the declared query implementations are run end-to-end on a
  * temp documents.parquet, so the properties exercise the exact code
  * the driver verifies.
  *
  * ScalaCheck generators are sampled with fixed seeds (deterministic CI)
  * rather than via forAll, because only scalacheck core is on the
  * offline classpath.
  */
class PropertySpec extends SparkSuite {

  private val vocab =
    Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")

  private val docGen: Gen[Seq[String]] = for {
    base <- Gen.choose(4, 10)
    docs <- Gen.listOfN(base, Gen.choose(5, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" "))))
    // plant near-dups: copies of doc 0 with one word replaced
    planted <- Gen.choose(0, 2).flatMap(k => Gen.listOfN(k,
      Gen.choose(0, 4).map { i =>
        val w = docs.head.split(' '); w(i % w.length) = "planted"
        w.mkString(" ")
      }))
  } yield docs ++ planted

  private def corpus(seed: Long): Seq[(Long, String)] =
    docGen(Gen.Parameters.default, Seed(seed)).get
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }

  /** Write a generated corpus as a documents table the declared queries
    * can read (same schema as Tables.documentsSchema). */
  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val sparkI = graft.SparkTestBase.spark
    import sparkI.implicits._
    val dir = Files.createTempDirectory("graft_prop").toString
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'gen' AS source",
        "CAST(length(text) AS LONG) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def shingleSet(text: String): Set[String] =
    text.split(' ').sliding(3).filter(_.length == 3)
      .map(_.mkString(" ")).toSet

  test("property: prefix-filtered Jaccard equals brute force (5 corpora)") {
    for (seed <- 1L to 5L) {
      val rows = writeThenRun(seed)
      val (docs, got) = rows
      val expect = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        sa = shingleSet(ta); sb = shingleSet(tb)
        u = (sa ++ sb).size if u > 0
        jac = sa.intersect(sb).size.toDouble / u if jac >= 0.6
      } yield (ia, ib, math.rint(jac * 1e6) / 1e6)).toSet
      assert(got == expect, s"seed=$seed")
    }
  }

  private def writeThenRun(seed: Long) = {
    val docs = corpus(seed)
    val dir = writeDocs(docs)
    val got = SparkEntry.queries("q_llm_dedup_jaccard")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    (docs, got)
  }

  test("property: exact dedup keeps exactly the min doc_id per text (5 corpora)") {
    for (seed <- 11L to 15L) {
      val docs = corpus(seed)
      val dir = writeDocs(docs)
      val got = SparkEntry.queries("q_llm_dedup_exact")(spark, dir)
        .collect().map(_.getLong(0)).toSet
      val expect = docs.groupBy(_._2).values.map(_.map(_._1).min).toSet
      assert(got == expect, s"seed=$seed")
      // idempotence: every survivor's text is unique => re-dedup is identity
      val survivors = docs.filter(d => expect(d._1))
      assert(survivors.map(_._2).distinct.size == survivors.size)
    }
  }

  test("property: banded MinHash finds every strongly-near pair (5 corpora)") {
    for (seed <- 31L to 35L) {
      val docs = corpus(seed)
      val dir = writeDocs(docs)
      val found = SparkEntry.queries("q_llm_dedup_near")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // brute-force pairs with Jaccard similarity >= 0.8: each of the 4
      // band-minhashes collides with prob >= 0.8, so recall is
      // 1-(1-s)^4 >= 0.998 per pair — and fixed seeds make it stable.
      val strong = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        sa = shingleSet(ta); sb = shingleSet(tb)
        u = (sa ++ sb).size if u > 0
        if sa.intersect(sb).size.toDouble / u >= 0.8
      } yield (ia, ib)).toSet
      assert(strong.subsetOf(found),
        s"seed=$seed missed ${strong -- found}")
    }
  }

  test("property: simhash band search finds every exact duplicate (3 corpora)") {
    for (seed <- 41L to 43L) {
      val base = corpus(seed)
      // plant exact duplicates: identical text => identical simhash =>
      // all four bands collide => the pair is found with certainty.
      val docs = base ++ base.take(2).map { case (id, t) =>
        (1000L + id, t)
      }
      val dir = writeDocs(docs)
      val found = SparkEntry.queries("q_llm_simhash_pairs")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(found.contains((0L, 1000L)), s"seed=$seed: $found")
      assert(found.contains((1L, 1001L)), s"seed=$seed: $found")
    }
  }

  test("property: simhash is bag-of-words order-invariant") {
    for (seed <- 21L to 40L) {
      val words = Gen.listOfN(30, Gen.oneOf(vocab))
        .apply(Gen.Parameters.default, Seed(seed)).get
      val perm = new scala.util.Random(seed).shuffle(words)
      assert(Simhash.simhash64(words) == Simhash.simhash64(perm))
      assert(Simhash.hamming(Simhash.simhash64(words),
        Simhash.simhash64(words)) == 0)
    }
  }

  test("property: the exactRound6 formula IS 6-dp HALF_UP on rationals") {
    // ⌊(2·10⁶·num + den)/(2·den)⌋ — the integer form every r15 ratio
    // output uses (Aggregates.exactRound6, its DuckDB mirror, and the
    // spec brute forces) — must equal BigDecimal HALF_UP rounding of
    // the exact rational num/den for ANY num, den ≥ 1, including exact
    // x.xxxxxx5 ties (where engine double images straddle).
    val rnd = new scala.util.Random(7)
    val cases = Seq.newBuilder[(BigInt, BigInt)]
    for (_ <- 1 to 2000) {
      val den = BigInt(rnd.nextLong(1000000000000L) + 1)
      cases += ((den * rnd.nextInt(1000) / 1000 +
        BigInt(rnd.nextLong(1000000)), den))
    }
    // adversarial exact ties: num/den = k/2·10⁻⁶ with odd k
    for (k <- Seq(1L, 3L, 999999L, 1999999L); den <- Seq(2000000L, 4000000L))
      cases += ((BigInt(k) * den / 2000000, BigInt(den)))
    cases.result().foreach { case (num0, den) =>
      val num = num0.min(den * 10) // keep within the documented range
      val scaled = (BigInt(2000000) * num + den) / (2 * den)
      val ref = (BigDecimal(num) / BigDecimal(den))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      assert(BigDecimal(scaled, 6) == ref,
        s"num=$num den=$den: formula=${BigDecimal(scaled, 6)} ref=$ref")
      // the r16 sign-split: sgn(num)·⌊(2·10⁶·|num|+den)/(2·den)⌋ must
      // be HALF_UP (half-AWAY-from-zero, SQL round) for negative num
      // too — including exact -x.xxxxxx5 ties, where a truncating or
      // flooring signed division would disagree between engines
      val neg = -num
      val negScaled = -((BigInt(2000000) * neg.abs + den) / (2 * den))
      val negRef = (BigDecimal(neg) / BigDecimal(den))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      assert(BigDecimal(negScaled, 6) == negRef,
        s"num=$neg den=$den: formula=${BigDecimal(negScaled, 6)} ref=$negRef")
    }
  }
}
