package streamline

import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import graft.SparkSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import streamline.batch.Cep
import streamline.batch.Cep.CepEv
import streamline.stream.CepStream

/** Randomized incremental ≡ batch equivalence for EVERY streaming CEP
  * operator: random event sequences, random monotone watermark
  * schedules, and random per-event delivery batches (any batch whose
  * watermark the event's time still exceeds — the same admission rule
  * Spark's late-row filter enforces). The streamed output must equal
  * the batch scan restricted to completions the final watermark
  * sealed. This is the harness the single-scenario specs can't
  * substitute for: it exercises buffer carry, partial sealing, armed
  * state across arbitrary batch boundaries, and out-of-order arrival
  * in one property. */
class CepStreamEquivalenceSpec extends SparkSuite {

  private val MIN_US = 60L * 1000 * 1000
  private val MIN_MS = 60L * 1000
  private val fbWin = 10 * MIN_US          // followedBy/any + kleene window
  private val optWin = 4L * 3600 * 1000 * 1000   // optional (4 h)
  private val timesWin = 24L * 3600 * 1000 * 1000 // times (1 day)
  private val skipWin = 24L * 3600 * 1000 * 1000  // skip family (1 day)

  // Single-key sequences: the operators are per-key, so per-key
  // equivalence is the whole property. ts ≥ 1 min keeps every event
  // above the first watermark step.
  private def evsGen: Gen[List[CepEv]] = for {
    n <- Gen.choose(20, 60)
    evs <- Gen.listOfN(n, for {
      t <- Gen.oneOf("click", "purchase", "view")
      ts <- Gen.choose(1L, 25L).map(_ * MIN_US)
    } yield (t, ts))
  } yield evs.zipWithIndex.map { case ((t, ts), i) =>
    CepEv(1L, i.toLong + 1, t, ts)
  }

  /** Drive an updater across batches of (watermarkMs, arrivals). */
  private def runIncremental[S, O](
      update: (Long, Iterator[CepEv], TestGroupState[S]) => Iterator[O],
      batches: List[(Long, List[CepEv])]): List[O] = {
    var st: Option[S] = None
    val out = scala.collection.mutable.ListBuffer[O]()
    batches.foreach { case (wmMs, evs) =>
      val gs = TestGroupState.create[S](
        optionalState = st match {
          case Some(s) => org.apache.spark.api.java.Optional.of(s)
          case None => org.apache.spark.api.java.Optional.empty[S]()
        },
        timeoutConf = GroupStateTimeout.EventTimeTimeout,
        batchProcessingTimeMs = 0L,
        eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(wmMs),
        hasTimedOut = false)
      out ++= update(1L, evs.iterator, gs)
      st = if (gs.isRemoved) None else gs.getOption
    }
    out.toList
  }

  /** Random monotone watermark schedule ending at wmMaxMin, with each
    * event assigned a random delivery batch it is still on-time for
    * (event ts strictly above that batch's watermark). */
  private def schedule(evs: List[CepEv], seed: Long,
                       wmMaxMin: Long): List[(Long, List[CepEv])] = {
    val rnd = new scala.util.Random(seed)
    val steps = (List.fill(3)(rnd.nextInt(26).toLong)
        .filter(_ < wmMaxMin) :+ wmMaxMin)
      .map(_ * MIN_MS).distinct.sorted
    val assigned = evs.map { e =>
      val ok = steps.indices.filter(i => steps(i) * 1000L < e.ts_us)
      val b = if (ok.isEmpty) 0 else ok(rnd.nextInt(ok.size))
      b -> e
    }
    steps.indices.toList.map(i =>
      steps(i) -> assigned.collect { case (b, e) if b == i => e })
  }

  private def checkAll(seed: Long, wmMaxMin: Long): Unit = {
    val sp = spark; import sp.implicits._
    val evs = evsGen(Gen.Parameters.default, Seed(seed)).get
    val sched = schedule(evs, seed * 31 + wmMaxMin, wmMaxMin)
    val finalWmUs = wmMaxMin * MIN_US

    val kGot = runIncremental(CepStream.updateCepStream, sched).toSet
    val kExp = Cep.kleeneMatches(evs.toDS(), "click", "purchase", fbWin)
      .collect().filter(_.purchase_ts_us <= finalWmUs).toSet
    assert(kGot == kExp, s"kleene seed=$seed wmMax=$wmMaxMin")

    val fGot = runIncremental(CepStream.updateFollowedByStream, sched).toSet
    val fExp = Cep.followedByMatches(evs.toDS(), "click", "purchase", fbWin)
      .collect().filter(_.purchase_ts_us <= finalWmUs).toSet
    assert(fGot == fExp, s"followedBy seed=$seed wmMax=$wmMaxMin")

    val aGot = runIncremental(CepStream.updateFollowedByAnyStream, sched).toSet
    val aExp = Cep.followedByAnyMatches(evs.toDS(), "click", "purchase",
      fbWin).collect().filter(_.purchase_ts_us <= finalWmUs).toSet
    assert(aGot == aExp, s"followedByAny seed=$seed wmMax=$wmMaxMin")

    val tGot = runIncremental(CepStream.updateTimesStream, sched).toSet
    val tExp = Cep.timesMatches(evs.toDS(), "click", "purchase", 3,
      timesWin).collect().filter(_.purchase_ts_us <= finalWmUs).toSet
    assert(tGot == tExp, s"times seed=$seed wmMax=$wmMaxMin")

    val oGot = runIncremental(CepStream.updateOptionalStream, sched).toSet
    val oExp = Cep.optionalMatches(evs.toDS(), "click", "view", "purchase",
      optWin).collect().filter(_.purchase_ts_us <= finalWmUs).toSet
    assert(oGot == oExp, s"optional seed=$seed wmMax=$wmMaxMin")

    // absence: emitted once the watermark (or a sealed later event)
    // proves the window closed without a purchase — strict bound
    val bGot = runIncremental(CepStream.updateAbsenceStream, sched).toSet
    val bExp = Cep.absenceMatches(evs.toDS(), "click", "purchase", fbWin)
      .collect().filter(_.click_ts_us + fbWin < finalWmUs).toSet
    assert(bGot == bExp, s"absence seed=$seed wmMax=$wmMaxMin")

    // r9 after-match-skip family: the four strategy twins share ONE
    // updater with (greedy, skip) closure parameters — drive each
    // through the same random schedule against its batch runner. The
    // stream updater's window is pinned at 1 day (matching the
    // registered witnesses), so the batch side gets the same window.
    Seq((true, Cep.NoSkip, "greedy"),
        (false, Cep.NoSkip, "noskip"),
        (false, Cep.SkipToNext, "skip_to_next"),
        (true, Cep.SkipPastLastEvent, "skip_past")).foreach {
      case (greedy, skip, label) =>
        val got = runIncremental[CepStream.RunBuf, Cep.CepRun](
          (uid, rows, st) =>
            CepStream.updateOneOrMoreStream(uid, rows, st, greedy, skip),
          sched).toSet
        val exp = Cep.oneOrMoreMatches(evs.toDS(), "click", "purchase",
            skipWin, greedy, skip)
          .collect().filter(_.purchase_ts_us <= finalWmUs).toSet
        assert(got == exp, s"$label seed=$seed wmMax=$wmMaxMin")
    }

    // until: run-extent truncation by the 'view' sentinel
    val uGot = runIncremental[CepStream.UntilBuf, Cep.CepRun](
      CepStream.updateUntilStream, sched).toSet
    val uExp = Cep.untilMatches(evs.toDS(), "click", "view", "purchase",
        skipWin)
      .collect().filter(_.purchase_ts_us <= finalWmUs).toSet
    assert(uGot == uExp, s"until seed=$seed wmMax=$wmMaxMin")
  }

  test("streamed CEP equals sealed-restricted batch when everything seals") {
    (1L to 6L).foreach(checkAll(_, wmMaxMin = 26 * 60 + 10))
  }

  test("streamed CEP equals sealed-restricted batch under PARTIAL sealing") {
    (1L to 6L).foreach(checkAll(_, wmMaxMin = 20L))
  }
}
