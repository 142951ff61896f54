package streamline.batch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import streamline.{Q, Tables}
import streamline.util.Det.tsSec

/** §2.15 general CEP: Kleene patterns (relaxed run length).
  *
  * q_cep_pattern (Windows.scala) covers the fixed-length strict form
  * (`next` = lag window). The reference lineage's CEP library
  * (upstream `flink-libraries/flink-cep/`) also matches unbounded
  * quantifiers — `begin(click).oneOrMore.next(purchase).within(10m)` —
  * which no fixed-width window can express. The engine here is the
  * keyed-run NFA executed as a single sorted partition scan:
  * repartition by key, sort within partitions by (key, time, id), and
  * run a constant-state automaton over the iterator. No per-key
  * materialization (unlike groupByKey+flatMapGroups, which buffers a
  * whole key group), so a hot key costs memory O(1), not O(events) —
  * the shape that survives 100 TB. One shuffle total; the sort is the
  * same local sort any window aggregate pays.
  */
object Cep {

  // public: Spark's generated row (de)serializers instantiate these
  // from codegen'd classes, which cannot see private members.
  case class CepEv(user_id: Long, event_id: Long,
                   event_type: String, ts_us: Long)
  case class CepMatch(user_id: Long, n_clicks: Long,
                      first_click_id: Long, purchase_id: Long,
                      first_ts_us: Long, purchase_ts_us: Long)

  /** NFA register: 0 = empty, n>0 = in a run of n `aType` events. One
    * automaton shared by the batch scan and the streaming keyed-state
    * operator (stream/CepStream.scala) — the match language is defined
    * once. */
  case class NfaSt(n: Long, firstId: Long, firstTs: Long)
  val nfaEmpty: NfaSt = NfaSt(0L, 0L, 0L)

  /** One transition of the Kleene-plus automaton matching `a+ b` (a
    * maximal consecutive run of ≥1 `aType` events immediately followed
    * by one `bType` event, whole match inside `withinUs`). Any other
    * event type resets. Greedy and non-overlapping, matching the CEP
    * library's AFTER_MATCH_SKIP / strict-run semantics; events MUST be
    * fed in (ts, id) order per key. */
  def stepNfa(st: NfaSt, e: CepEv, aType: String, bType: String,
              withinUs: Long): (NfaSt, Option[CepMatch]) =
    if (e.event_type == aType) {
      if (st.n == 0L) (NfaSt(1L, e.event_id, e.ts_us), None)
      else (st.copy(n = st.n + 1), None)
    } else if (e.event_type == bType && st.n > 0 &&
               e.ts_us <= st.firstTs + withinUs) {
      (nfaEmpty, Some(CepMatch(e.user_id, st.n, st.firstId, e.event_id,
        st.firstTs, e.ts_us)))
    } else (nfaEmpty, None)

  /** The automaton over a key-sorted iterator (state resets at each
    * user boundary — constant memory regardless of key size). */
  private def runNfa(it: Iterator[CepEv], aType: String, bType: String,
                     withinUs: Long): Iterator[CepMatch] = {
    var curUser = Long.MinValue
    var st = nfaEmpty
    it.flatMap { e =>
      if (e.user_id != curUser) { curUser = e.user_id; st = nfaEmpty }
      val (st2, m) = stepNfa(st, e, aType, bType, withinUs)
      st = st2
      m.iterator
    }
  }

  /** The whole keyed-NFA pipeline: shuffle on the key, locally order,
    * scan. Public so the boundary spec can drive it with crafted
    * streams. */
  def kleeneMatches(evs: org.apache.spark.sql.Dataset[CepEv], aType: String,
                    bType: String, withinUs: Long): org.apache.spark.sql.Dataset[CepMatch] = {
    import evs.sparkSession.implicits._
    evs.repartition($"user_id")
      .sortWithinPartitions($"user_id", $"ts_us", $"event_id")
      .mapPartitions(it => runNfa(it, aType, bType, withinUs))
  }

  /** q_cep_kleene — `click+ purchase within 10 min` per user: a maximal
    * run of consecutive clicks immediately followed by a purchase, with
    * the purchase at most 10 minutes after the FIRST click of the run
    * (Flink CEP `within` spans the whole match). Emits the run length,
    * its boundary event ids and both timestamps. */
  private def cepKleene(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val withinUs = 10L * 60 * 1000 * 1000
    val evs = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type",
        unix_micros($"ts").as("ts_us"))
      .as[CepEv]
    kleeneMatches(evs, "click", "purchase", withinUs).toDF()
      .select($"user_id", $"n_clicks", $"first_click_id", $"purchase_id",
        tsSec(timestamp_micros($"first_ts_us")).as("first_click_ts"),
        tsSec(timestamp_micros($"purchase_ts_us")).as("purchase_ts"))
      .orderBy($"user_id", $"purchase_id")
  }

  /** Oracle: the gaps-and-islands spelling — click islands via the
    * row_number-difference trick, joined to the purchase sitting at
    * exactly island-end + 1. */
  private[batch] val cepKleeneSql = """
    WITH e AS (SELECT user_id, event_id, event_type,
                 date_trunc('microseconds', ts) AS ts FROM events),
    o AS (SELECT user_id, event_id, event_type, ts,
            row_number() OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS rn
          FROM e),
    isl AS (SELECT user_id, event_id, ts, rn,
              rn - row_number() OVER (PARTITION BY user_id
                                      ORDER BY rn) AS grp
            FROM o WHERE event_type = 'click'),
    runs AS (SELECT user_id, grp, count(*) AS n_clicks,
               min(ts) AS first_click_ts,
               arg_min(event_id, rn) AS first_click_id,
               max(rn) AS end_rn
             FROM isl GROUP BY user_id, grp),
    p AS (SELECT user_id, event_id, ts, rn FROM o
          WHERE event_type = 'purchase')
    SELECT r.user_id AS user_id, n_clicks, first_click_id,
      p.event_id AS purchase_id,
      date_trunc('second', first_click_ts) AS first_click_ts,
      date_trunc('second', p.ts) AS purchase_ts
    FROM runs r JOIN p ON r.user_id = p.user_id AND p.rn = r.end_rn + 1
    WHERE p.ts <= first_click_ts + INTERVAL 10 MINUTE
    ORDER BY user_id, purchase_id"""

  // ---------------------------------------------------------------
  // Relaxed contiguity + absence (upstream flink-libraries/flink-cep
  // `followedBy` / `notFollowedBy`): unlike the strict-run Kleene
  // automaton above, `followedBy` SKIPS irrelevant events between the
  // pattern's stages, and `notFollowedBy ... within` asserts a stage
  // never arrives inside the window. Same engine shape — one shuffle
  // on the key, sorted partition scan — with the NFA register widened
  // to the set of armed starts. That buffer is WATERMARK-BOUNDED, not
  // key-bounded: every armed start either matches at the next bType
  // event or expires `withinUs` after it was armed, so memory is
  // O(starts per window), the same accounting Flink's CEP shared
  // buffer does, and the scan stays O(1)-per-event amortized.
  // ---------------------------------------------------------------

  case class CepRel(user_id: Long, click_id: Long, purchase_id: Long,
                    click_ts_us: Long, purchase_ts_us: Long)
  case class CepAbs(user_id: Long, click_id: Long, click_ts_us: Long)

  /** `a followedBy b within w` over one user's (ts, id)-sorted events:
    * every armed `a` matches the FIRST `b` that arrives within `w` of
    * it (Flink `followedBy` first-match semantics, not
    * `followedByAny`); events of other types are skipped. A `b` event
    * resolves every currently armed `a` — matched if within the
    * window — and disarms them all. */
  private def runFollowedBy(it: Iterator[CepEv], aType: String,
                            bType: String,
                            withinUs: Long): Iterator[CepRel] = {
    var curUser = Long.MinValue
    val pending = scala.collection.mutable.ArrayDeque[(Long, Long)]()
    it.flatMap { e =>
      if (e.user_id != curUser) { curUser = e.user_id; pending.clear() }
      // expired starts can never match a later b: drop from the head
      // (ts-ordered input ⇒ oldest first), keeping the buffer
      // window-bounded
      while (pending.nonEmpty && pending.head._2 < e.ts_us - withinUs)
        pending.removeHead()
      if (e.event_type == aType) {
        pending.append((e.event_id, e.ts_us)); Iterator.empty
      } else if (e.event_type == bType) {
        val out = pending.iterator.map { case (id, ts) =>
          CepRel(e.user_id, id, e.event_id, ts, e.ts_us)
        }.toVector
        pending.clear()
        out.iterator
      } else Iterator.empty
    }
  }

  /** `a followedByAny b within w` — the ALL-matches quantifier
    * (upstream flink-cep `followedByAny`, Quantifier's
    * non-deterministic relaxed contiguity): where `followedBy` lets a
    * `b` resolve-and-disarm every armed `a`, here each armed `a` keeps
    * matching EVERY `b` inside its window, so one click with three
    * in-window purchases yields three pairs. The armed buffer is still
    * window-bounded — a start lives exactly `withinUs` past its
    * arrival, never longer — so the all-matches form costs output
    * size, not state. */
  private def runFollowedByAny(it: Iterator[CepEv], aType: String,
                               bType: String,
                               withinUs: Long): Iterator[CepRel] = {
    var curUser = Long.MinValue
    val pending = scala.collection.mutable.ArrayDeque[(Long, Long)]()
    it.flatMap { e =>
      if (e.user_id != curUser) { curUser = e.user_id; pending.clear() }
      while (pending.nonEmpty && pending.head._2 < e.ts_us - withinUs)
        pending.removeHead()
      if (e.event_type == aType) {
        pending.append((e.event_id, e.ts_us)); Iterator.empty
      } else if (e.event_type == bType) {
        // every remaining armed start is in-window (ts-ordered input +
        // head expiry) — emit all, KEEP them armed for later b's
        pending.iterator.map { case (id, ts) =>
          CepRel(e.user_id, id, e.event_id, ts, e.ts_us)
        }.toVector.iterator
      } else Iterator.empty
    }
  }

  case class CepTimes(user_id: Long, first_click_id: Long,
                      third_click_id: Long, purchase_id: Long,
                      first_ts_us: Long, purchase_ts_us: Long)

  case class CepOpt(user_id: Long, click_id: Long, view_id: Option[Long],
                    purchase_id: Long, click_ts_us: Long,
                    purchase_ts_us: Long)

  /** `a (m?) b within w` — the OPTIONAL quantifier (flink-cep
    * `optional`): the three-stage pattern matches with or without its
    * middle stage, and when the middle occurred the match CAPTURES it.
    * followedBy first-match semantics on the (a, b) spine: each armed
    * `a` matches the first in-window `b`, one `b` resolves-and-disarms
    * all; the optional `m` is the first m-event seen after the `a`
    * (necessarily before the resolving `b`, hence inside the window),
    * or None. Same window-bounded armed buffer, widened by one
    * captured id per start. */
  private def runOptional(it: Iterator[CepEv], aType: String,
                          mType: String, bType: String,
                          withinUs: Long): Iterator[CepOpt] = {
    var curUser = Long.MinValue
    val pending =
      scala.collection.mutable.ArrayDeque[(Long, Long, Option[Long])]()
    it.flatMap { e =>
      if (e.user_id != curUser) { curUser = e.user_id; pending.clear() }
      while (pending.nonEmpty && pending.head._2 < e.ts_us - withinUs)
        pending.removeHead()
      if (e.event_type == aType) {
        pending.append((e.event_id, e.ts_us, None)); Iterator.empty
      } else if (e.event_type == mType) {
        // first m after each armed a fills its optional slot
        pending.mapInPlace {
          case (id, ts, None) => (id, ts, Some(e.event_id))
          case filled => filled
        }
        Iterator.empty
      } else if (e.event_type == bType) {
        val out = pending.iterator.map { case (id, ts, m) =>
          CepOpt(e.user_id, id, m, e.event_id, ts, e.ts_us)
        }.toVector
        pending.clear()
        out.iterator
      } else Iterator.empty
    }
  }

  /** `a.times(n) followedBy b within w` for n=3 — bounded repetition
    * with the relaxed contiguity Flink's `times(n)` defaults to
    * (repetitions are n SUCCESSIVE `a`-occurrences in the
    * type-filtered substream; other event types interleave freely, but
    * the combination is not free — that would be `allowCombinations`).
    * A triple arms when its third click arrives; the first `b` after
    * that, within `w` of the triple's FIRST click (within spans the
    * whole match), completes it and — first-match semantics, as in
    * `followedBy` — disarms every armed triple. State is the last
    * n−1 clicks plus the armed triples, both window-bounded. */
  private def runTimesFollowedBy(it: Iterator[CepEv], aType: String,
                                 bType: String, n: Int,
                                 withinUs: Long): Iterator[CepTimes] = {
    require(n == 3, "runner is specialized to times(3)")
    var curUser = Long.MinValue
    val recent = scala.collection.mutable.ArrayDeque[(Long, Long)]()
    val armed = scala.collection.mutable.ArrayDeque[(Long, Long, Long)]()
    it.flatMap { e =>
      if (e.user_id != curUser) {
        curUser = e.user_id; recent.clear(); armed.clear()
      }
      // expire triples whose whole-match window closed (firstTs-anchored)
      while (armed.nonEmpty && armed.head._2 < e.ts_us - withinUs)
        armed.removeHead()
      if (e.event_type == aType) {
        if (recent.size == 2) {
          val (fid, fts) = recent.head
          // arm only if the third click itself is still inside the
          // first click's window — otherwise no b can ever complete it
          if (e.ts_us <= fts + withinUs) armed.append((fid, fts, e.event_id))
        }
        recent.append((e.event_id, e.ts_us))
        if (recent.size > 2) recent.removeHead(): Unit
        Iterator.empty
      } else if (e.event_type == bType) {
        val out = armed.iterator.map { case (fid, fts, tid) =>
          CepTimes(e.user_id, fid, tid, e.event_id, fts, e.ts_us)
        }.toVector
        armed.clear()
        out.iterator
      } else Iterator.empty
    }
  }

  /** `a notFollowedBy b within w`: emit each `a` that is NOT followed
    * by any `b` in the next `w` microseconds. An armed `a` is emitted
    * the moment it provably survived (the scan reaches any event past
    * its window), killed by an in-window `b`, and flushed at the user
    * boundary / end of input — batch input is complete, so absence at
    * end-of-data is decided, the batch shortcut streaming pays a
    * watermark for. */
  private def runAbsence(it: Iterator[CepEv], aType: String,
                         bType: String,
                         withinUs: Long): Iterator[CepAbs] = {
    var curUser = Long.MinValue
    val pending = scala.collection.mutable.ArrayDeque[(Long, Long)]()
    def flush(): Vector[CepAbs] = {
      val out = pending.iterator
        .map { case (id, ts) => CepAbs(curUser, id, ts) }.toVector
      pending.clear(); out
    }
    (it.map(Some(_)) ++ Iterator(None)).flatMap {
      case None => flush().iterator // end of input: survivors all pass
      case Some(e) =>
        val boundary = if (e.user_id != curUser) {
          val f = flush(); curUser = e.user_id; f
        } else Vector.empty
        // survived: window closed before this event without a bType
        val survived = Vector.newBuilder[CepAbs]
        while (pending.nonEmpty && pending.head._2 < e.ts_us - withinUs) {
          val (id, ts) = pending.removeHead()
          survived += CepAbs(e.user_id, id, ts)
        }
        if (e.event_type == bType) pending.clear() // in-window ⇒ killed
        else if (e.event_type == aType) pending.append((e.event_id, e.ts_us))
        (boundary ++ survived.result()).iterator
    }
  }

  /** Keyed pipeline twins of [[kleeneMatches]]; public for the
    * boundary spec. */
  def followedByMatches(evs: org.apache.spark.sql.Dataset[CepEv],
                        aType: String, bType: String,
                        withinUs: Long): org.apache.spark.sql.Dataset[CepRel] = {
    import evs.sparkSession.implicits._
    evs.repartition($"user_id")
      .sortWithinPartitions($"user_id", $"ts_us", $"event_id")
      .mapPartitions(it => runFollowedBy(it, aType, bType, withinUs))
  }

  def absenceMatches(evs: org.apache.spark.sql.Dataset[CepEv],
                     aType: String, bType: String,
                     withinUs: Long): org.apache.spark.sql.Dataset[CepAbs] = {
    import evs.sparkSession.implicits._
    evs.repartition($"user_id")
      .sortWithinPartitions($"user_id", $"ts_us", $"event_id")
      .mapPartitions(it => runAbsence(it, aType, bType, withinUs))
  }

  def followedByAnyMatches(evs: org.apache.spark.sql.Dataset[CepEv],
                           aType: String, bType: String,
                           withinUs: Long): org.apache.spark.sql.Dataset[CepRel] = {
    import evs.sparkSession.implicits._
    evs.repartition($"user_id")
      .sortWithinPartitions($"user_id", $"ts_us", $"event_id")
      .mapPartitions(it => runFollowedByAny(it, aType, bType, withinUs))
  }

  def timesMatches(evs: org.apache.spark.sql.Dataset[CepEv],
                   aType: String, bType: String, n: Int,
                   withinUs: Long): org.apache.spark.sql.Dataset[CepTimes] = {
    import evs.sparkSession.implicits._
    evs.repartition($"user_id")
      .sortWithinPartitions($"user_id", $"ts_us", $"event_id")
      .mapPartitions(it => runTimesFollowedBy(it, aType, bType, n, withinUs))
  }

  def optionalMatches(evs: org.apache.spark.sql.Dataset[CepEv],
                      aType: String, mType: String, bType: String,
                      withinUs: Long): org.apache.spark.sql.Dataset[CepOpt] = {
    import evs.sparkSession.implicits._
    evs.repartition($"user_id")
      .sortWithinPartitions($"user_id", $"ts_us", $"event_id")
      .mapPartitions(it => runOptional(it, aType, mType, bType, withinUs))
  }

  private def cepEvents(spark: SparkSession, dir: String) = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type",
        unix_micros($"ts").as("ts_us"))
      .as[CepEv]
  }

  /** q_cep_followedby — `click followedBy purchase within 10 min` per
    * user, relaxed contiguity: any events may sit between the click
    * and its purchase; each click matches the first purchase inside
    * its window, and one purchase resolves all clicks armed before
    * it. */
  private def cepFollowedBy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val withinUs = 10L * 60 * 1000 * 1000
    followedByMatches(cepEvents(spark, dir), "click", "purchase", withinUs)
      .toDF()
      .select($"user_id", $"click_id", $"purchase_id",
        tsSec(timestamp_micros($"click_ts_us")).as("click_ts"),
        tsSec(timestamp_micros($"purchase_ts_us")).as("purchase_ts"))
      .orderBy($"user_id", $"click_id")
  }

  /** Oracle: per click, the first purchase strictly after it in the
    * per-user (ts, event_id) total order and within the window —
    * "first" via arg_min over that order's row number. */
  private val cepFollowedBySql = """
    WITH e AS (SELECT user_id, event_id, event_type,
                 date_trunc('microseconds', ts) AS ts FROM events),
    o AS (SELECT user_id, event_id, event_type, ts,
            row_number() OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS rn
          FROM e),
    c AS (SELECT user_id, event_id AS click_id, ts AS cts, rn FROM o
          WHERE event_type = 'click'),
    p AS (SELECT user_id, event_id AS purchase_id, ts AS pts, rn FROM o
          WHERE event_type = 'purchase')
    SELECT c.user_id AS user_id, c.click_id,
      arg_min(p.purchase_id, p.rn) AS purchase_id,
      date_trunc('second', c.cts) AS click_ts,
      date_trunc('second', arg_min(p.pts, p.rn)) AS purchase_ts
    FROM c JOIN p
      ON c.user_id = p.user_id AND p.rn > c.rn
     AND p.pts <= c.cts + INTERVAL 10 MINUTE
    GROUP BY c.user_id, c.click_id, c.cts
    ORDER BY user_id, click_id"""

  /** q_cep_absence — `click notFollowedBy purchase within 10 min`:
    * clicks with NO purchase in their forward window (the negative
    * pattern; upstream flink-cep `notFollowedBy` closed by `within`).
    * The abandoned-cart query at 100 TB. */
  private def cepAbsence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val withinUs = 10L * 60 * 1000 * 1000
    absenceMatches(cepEvents(spark, dir), "click", "purchase", withinUs)
      .toDF()
      .select($"user_id", $"click_id",
        tsSec(timestamp_micros($"click_ts_us")).as("click_ts"))
      .orderBy($"user_id", $"click_id")
  }

  private val cepAbsenceSql = """
    WITH e AS (SELECT user_id, event_id, event_type,
                 date_trunc('microseconds', ts) AS ts FROM events),
    o AS (SELECT user_id, event_id, event_type, ts,
            row_number() OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS rn
          FROM e),
    c AS (SELECT user_id, event_id AS click_id, ts AS cts, rn FROM o
          WHERE event_type = 'click'),
    p AS (SELECT user_id, ts AS pts, rn FROM o
          WHERE event_type = 'purchase')
    SELECT c.user_id AS user_id, c.click_id,
      date_trunc('second', c.cts) AS click_ts
    FROM c
    WHERE NOT EXISTS (
      SELECT 1 FROM p
      WHERE p.user_id = c.user_id AND p.rn > c.rn
        AND p.pts <= c.cts + INTERVAL 10 MINUTE)
    ORDER BY user_id, click_id"""

  /** q_cep_followedby_any — `click followedByAny purchase within 10
    * min`: the ALL-matches cross of armed clicks × in-window purchases
    * (every click pairs with EVERY purchase inside its window), vs
    * q_cep_followedby's first-match-and-disarm. */
  private def cepFollowedByAny(spark: SparkSession,
                               dir: String): DataFrame = {
    import spark.implicits._
    val withinUs = 10L * 60 * 1000 * 1000
    followedByAnyMatches(cepEvents(spark, dir), "click", "purchase",
        withinUs)
      .toDF()
      .select($"user_id", $"click_id", $"purchase_id",
        tsSec(timestamp_micros($"click_ts_us")).as("click_ts"),
        tsSec(timestamp_micros($"purchase_ts_us")).as("purchase_ts"))
      .orderBy($"user_id", $"click_id", $"purchase_id")
  }

  /** Oracle: the plain window join — every (click, later purchase)
    * pair inside the window, no arg_min. */
  private val cepFollowedByAnySql = """
    WITH e AS (SELECT user_id, event_id, event_type,
                 date_trunc('microseconds', ts) AS ts FROM events),
    o AS (SELECT user_id, event_id, event_type, ts,
            row_number() OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS rn
          FROM e),
    c AS (SELECT user_id, event_id AS click_id, ts AS cts, rn FROM o
          WHERE event_type = 'click'),
    p AS (SELECT user_id, event_id AS purchase_id, ts AS pts, rn FROM o
          WHERE event_type = 'purchase')
    SELECT c.user_id AS user_id, c.click_id, p.purchase_id,
      date_trunc('second', c.cts) AS click_ts,
      date_trunc('second', p.pts) AS purchase_ts
    FROM c JOIN p
      ON c.user_id = p.user_id AND p.rn > c.rn
     AND p.pts <= c.cts + INTERVAL 10 MINUTE
    ORDER BY user_id, click_id, purchase_id"""

  /** q_cep_times — `click.times(3) followedBy purchase within 1 day`:
    * bounded repetition (three successive clicks in the click
    * substream, relaxed contiguity) completed by the first subsequent
    * purchase within one day of the triple's FIRST click. The window
    * is a day, not the usual 10 minutes, because a triple-click chain
    * is a much rarer anchor than a single event — the 10-minute form
    * is empty on the harness corpus and would make a vacuous witness
    * (the automaton's edge cases are property-tested separately at
    * tight windows in CepPropertySpec). */
  private def cepTimes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val withinUs = 24L * 3600 * 1000 * 1000
    timesMatches(cepEvents(spark, dir), "click", "purchase", 3, withinUs)
      .toDF()
      .select($"user_id", $"first_click_id", $"third_click_id",
        $"purchase_id",
        tsSec(timestamp_micros($"first_ts_us")).as("first_click_ts"),
        tsSec(timestamp_micros($"purchase_ts_us")).as("purchase_ts"))
      .orderBy($"user_id", $"first_click_id", $"purchase_id")
  }

  /** Oracle: number the clicks per user (cn); a triple is (cn, cn+2)
    * with the third click inside the first's window; its purchase is
    * the first one after the third click (arg_min over rn) within the
    * window of the first. */
  private val cepTimesSql = """
    WITH e AS (SELECT user_id, event_id, event_type,
                 date_trunc('microseconds', ts) AS ts FROM events),
    o AS (SELECT user_id, event_id, event_type, ts,
            row_number() OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS rn
          FROM e),
    c AS (SELECT user_id, event_id, ts, rn,
            row_number() OVER (PARTITION BY user_id ORDER BY rn) AS cn
          FROM o WHERE event_type = 'click'),
    t AS (SELECT c1.user_id, c1.event_id AS first_click_id,
            c1.ts AS cts, c3.event_id AS third_click_id, c3.rn AS arn
          FROM c c1 JOIN c c3
            ON c1.user_id = c3.user_id AND c3.cn = c1.cn + 2
          WHERE c3.ts <= c1.ts + INTERVAL 1 DAY),
    p AS (SELECT user_id, event_id AS purchase_id, ts AS pts, rn FROM o
          WHERE event_type = 'purchase')
    SELECT t.user_id AS user_id, t.first_click_id, t.third_click_id,
      arg_min(p.purchase_id, p.rn) AS purchase_id,
      date_trunc('second', t.cts) AS first_click_ts,
      date_trunc('second', arg_min(p.pts, p.rn)) AS purchase_ts
    FROM t JOIN p
      ON t.user_id = p.user_id AND p.rn > t.arn
     AND p.pts <= t.cts + INTERVAL 1 DAY
    GROUP BY t.user_id, t.first_click_id, t.third_click_id, t.cts
    ORDER BY user_id, first_click_id, purchase_id"""

  /** q_cep_optional — `click (view?) purchase within 4 hours`: the
    * followedBy spine with an OPTIONAL captured middle stage — the
    * match reports the first view between the click and its purchase,
    * or NULL when the pattern matched without one. The 4-hour window
    * (vs the family's usual 10 minutes) is what makes BOTH branches
    * live on the harness corpus: at 10 min every match is view-less
    * and the capture path would be vacuous (the tight-window edge
    * cases stay covered by CepPropertySpec's random corpora). */
  private def cepOptional(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val withinUs = 4L * 3600 * 1000 * 1000
    optionalMatches(cepEvents(spark, dir), "click", "view", "purchase",
        withinUs)
      .toDF()
      .select($"user_id", $"click_id", $"view_id", $"purchase_id",
        tsSec(timestamp_micros($"click_ts_us")).as("click_ts"),
        tsSec(timestamp_micros($"purchase_ts_us")).as("purchase_ts"))
      .orderBy($"user_id", $"click_id")
  }

  /** Oracle: the q_cep_followedby match spine, LEFT-extended by a
    * correlated first-view-between lookup (NULL when the optional
    * stage did not occur). */
  private val cepOptionalSql = """
    WITH e AS (SELECT user_id, event_id, event_type,
                 date_trunc('microseconds', ts) AS ts FROM events),
    o AS (SELECT user_id, event_id, event_type, ts,
            row_number() OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS rn
          FROM e),
    c AS (SELECT user_id, event_id AS click_id, ts AS cts, rn FROM o
          WHERE event_type = 'click'),
    p AS (SELECT user_id, event_id AS purchase_id, ts AS pts, rn FROM o
          WHERE event_type = 'purchase'),
    m AS (SELECT c.user_id AS user_id, c.click_id, c.rn AS crn,
            c.cts AS cts,
            arg_min(p.purchase_id, p.rn) AS purchase_id,
            arg_min(p.pts, p.rn) AS pts,
            min(p.rn) AS prn
          FROM c JOIN p
            ON c.user_id = p.user_id AND p.rn > c.rn
           AND p.pts <= c.cts + INTERVAL 4 HOUR
          GROUP BY c.user_id, c.click_id, c.rn, c.cts)
    SELECT m.user_id, m.click_id,
      (SELECT v.event_id FROM o v
       WHERE v.user_id = m.user_id AND v.event_type = 'view'
         AND v.rn > m.crn AND v.rn < m.prn
       ORDER BY v.rn LIMIT 1) AS view_id,
      m.purchase_id,
      date_trunc('second', m.cts) AS click_ts,
      date_trunc('second', m.pts) AS purchase_ts
    FROM m ORDER BY user_id, click_id"""

  // ---------------------------------------------------------------
  // After-match skip strategies + run-extent quantifiers (upstream
  // flink-libraries/flink-cep AfterMatchSkipStrategy, Quantifier's
  // greedy / until): the quantifier matrix above fixes WHICH pattern
  // matches; these fix WHICH OF THE OVERLAPPING MATCHES EMIT
  // (NO_SKIP / SKIP_TO_NEXT / SKIP_PAST_LAST_EVENT) and HOW FAR a
  // oneOrMore run extends (greedy = maximal, until = stop at a
  // sentinel condition). One shared runner executes the whole family:
  // the strategies are parameters of a single armed-buffer automaton,
  // not five copies of it, so a strategy witness really witnesses the
  // strategy. State stays window-bounded exactly as in followedBy —
  // an armed start lives at most `withinUs` past its arrival.
  // ---------------------------------------------------------------

  /** Which completed matches an `a.oneOrMore followedBy b` emission
    * keeps (flink-cep AfterMatchSkipStrategy):
    *  - [[NoSkip]]: every completed match emits — for a non-greedy
    *    oneOrMore that is every prefix of every armed run.
    *  - [[SkipToNext]]: of the matches sharing a START event, only the
    *    first (shortest) emits.
    *  - [[SkipPastLastEvent]]: only the match anchored at the EARLIEST
    *    armed start emits; everything overlapping it is skipped, so
    *    consecutive emitted matches never overlap. */
  sealed trait AfterMatchSkip
  case object NoSkip extends AfterMatchSkip
  case object SkipToNext extends AfterMatchSkip
  case object SkipPastLastEvent extends AfterMatchSkip

  case class CepRun(user_id: Long, first_click_id: Long, n_clicks: Long,
                    purchase_id: Long, first_ts_us: Long,
                    purchase_ts_us: Long)

  /** `a.oneOrMore followedBy b within w` with an explicit greedy flag
    * and after-match skip strategy, over one user's (ts, id)-sorted
    * events. Armed entries carry (firstId, firstTs, clicks captured so
    * far); every `a` extends all in-window runs and opens its own; a
    * `b` completes-and-disarms all (first-match spine, as in
    * followedBy), and the strategy then selects which completions
    * emit. All strategies share this one transition function. */
  private def runOneOrMore(it: Iterator[CepEv], aType: String,
                           bType: String, withinUs: Long,
                           greedy: Boolean,
                           skip: AfterMatchSkip): Iterator[CepRun] = {
    var curUser = Long.MinValue
    val armed = scala.collection.mutable.ArrayDeque[(Long, Long, Long)]()
    it.flatMap { e =>
      if (e.user_id != curUser) { curUser = e.user_id; armed.clear() }
      while (armed.nonEmpty && armed.head._2 < e.ts_us - withinUs)
        armed.removeHead()
      if (e.event_type == aType) {
        // every armed run is in-window (head expiry above) and relaxed
        // contiguity lets it absorb this occurrence; then the
        // occurrence opens its own run
        armed.mapInPlace { case (id, ts, n) => (id, ts, n + 1) }
        armed.append((e.event_id, e.ts_us, 1L))
        Iterator.empty
      } else if (e.event_type == bType) {
        val starts = skip match {
          case SkipPastLastEvent => armed.headOption.toSeq
          case _                 => armed.toSeq
        }
        val out = starts.flatMap { case (id, ts, n) =>
          val lengths: Seq[Long] =
            if (greedy) Seq(n) // maximal extent only
            else skip match {
              case SkipToNext => Seq(1L) // shortest same-start match
              case _          => (1L to n) // every prefix
            }
          lengths.map(k =>
            CepRun(e.user_id, id, k, e.event_id, ts, e.ts_us))
        }
        armed.clear()
        out.iterator
      } else Iterator.empty
    }
  }

  /** `a.oneOrMore.until(u) followedBy b within w`: greedy run extent,
    * but a run stops ABSORBING further `a`s once the until-sentinel
    * `u` occurs after its start (flink-cep `until`; the sentinel event
    * itself is never part of the match, and the `b` stage still
    * completes the run). Armed entries widen by an open/closed bit. */
  private def runUntil(it: Iterator[CepEv], aType: String, uType: String,
                       bType: String,
                       withinUs: Long): Iterator[CepRun] = {
    var curUser = Long.MinValue
    val armed =
      scala.collection.mutable.ArrayDeque[(Long, Long, Long, Boolean)]()
    it.flatMap { e =>
      if (e.user_id != curUser) { curUser = e.user_id; armed.clear() }
      while (armed.nonEmpty && armed.head._2 < e.ts_us - withinUs)
        armed.removeHead()
      if (e.event_type == aType) {
        armed.mapInPlace {
          case (id, ts, n, true) => (id, ts, n + 1, true)
          case closed            => closed
        }
        armed.append((e.event_id, e.ts_us, 1L, true))
        Iterator.empty
      } else if (e.event_type == uType) {
        armed.mapInPlace { case (id, ts, n, _) => (id, ts, n, false) }
        Iterator.empty
      } else if (e.event_type == bType) {
        val out = armed.iterator.map { case (id, ts, n, _) =>
          CepRun(e.user_id, id, n, e.event_id, ts, e.ts_us)
        }.toVector
        armed.clear()
        out.iterator
      } else Iterator.empty
    }
  }

  /** Keyed pipeline twins of [[kleeneMatches]]; public for the
    * property spec. */
  def oneOrMoreMatches(evs: org.apache.spark.sql.Dataset[CepEv],
                       aType: String, bType: String, withinUs: Long,
                       greedy: Boolean, skip: AfterMatchSkip)
      : org.apache.spark.sql.Dataset[CepRun] = {
    import evs.sparkSession.implicits._
    evs.repartition($"user_id")
      .sortWithinPartitions($"user_id", $"ts_us", $"event_id")
      .mapPartitions(it => runOneOrMore(it, aType, bType, withinUs,
        greedy, skip))
  }

  def untilMatches(evs: org.apache.spark.sql.Dataset[CepEv],
                   aType: String, uType: String, bType: String,
                   withinUs: Long)
      : org.apache.spark.sql.Dataset[CepRun] = {
    import evs.sparkSession.implicits._
    evs.repartition($"user_id")
      .sortWithinPartitions($"user_id", $"ts_us", $"event_id")
      .mapPartitions(it => runUntil(it, aType, uType, bType, withinUs))
  }

  private def runProject(ds: org.apache.spark.sql.Dataset[CepRun])
      : DataFrame = {
    import ds.sparkSession.implicits._
    ds.toDF()
      .select($"user_id", $"first_click_id", $"n_clicks", $"purchase_id",
        tsSec(timestamp_micros($"first_ts_us")).as("first_click_ts"),
        tsSec(timestamp_micros($"purchase_ts_us")).as("purchase_ts"))
      .orderBy($"user_id", $"first_click_id", $"n_clicks", $"purchase_id")
  }

  /** One day, not the family's usual 10 minutes: at 10 min (and even
    * 4 h) every matched run on the harness corpus has exactly one
    * click and every purchase exactly one armed start, so greedy =
    * noskip = skip_to_next and skip_past = greedy — the witnesses
    * would be vacuously equal. At 1 day the corpus distinguishes all
    * of them (134 multi-click runs, 692 greedy vs 846 noskip vs 558
    * skip_past rows, 11 until-truncated runs at sf0.01). */
  private val oneDayUs = 24L * 3600 * 1000 * 1000

  /** The shared oracle spine: per click, its first in-window purchase
    * (rn-ordered), plus the per-user click numbering `cn` that lets
    * run lengths be computed by subtraction. */
  private val oneOrMoreCtes = """
    WITH e AS (SELECT user_id, event_id, event_type,
                 date_trunc('microseconds', ts) AS ts FROM events),
    o AS (SELECT user_id, event_id, event_type, ts,
            row_number() OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS rn
          FROM e),
    c AS (SELECT user_id, event_id AS click_id, ts AS cts, rn,
            row_number() OVER (PARTITION BY user_id ORDER BY rn) AS cn
          FROM o WHERE event_type = 'click'),
    p AS (SELECT user_id, event_id AS purchase_id, ts AS pts, rn FROM o
          WHERE event_type = 'purchase'),
    spine AS (SELECT c.user_id, c.click_id, c.cn, c.rn AS crn, c.cts,
                arg_min(p.purchase_id, p.rn) AS purchase_id,
                arg_min(p.pts, p.rn) AS pts, min(p.rn) AS prn
              FROM c JOIN p
                ON c.user_id = p.user_id AND p.rn > c.rn
               AND p.pts <= c.cts + INTERVAL 1 DAY
              GROUP BY c.user_id, c.click_id, c.cn, c.rn, c.cts),
    g AS (SELECT s.*,
            (SELECT count(*) FROM c c2
             WHERE c2.user_id = s.user_id
               AND c2.rn >= s.crn AND c2.rn < s.prn) AS n_clicks
          FROM spine s)"""

  /** q_cep_greedy — `click.oneOrMore.greedy followedBy purchase within
    * 1 day`: one match per armed click start, capturing the MAXIMAL
    * click run between the start and the resolving purchase (flink-cep
    * `greedy`: the quantifier absorbs as many occurrences as the
    * window allows; contrast q_cep_noskip's every-prefix expansion). */
  private def cepGreedy(spark: SparkSession, dir: String): DataFrame =
    runProject(oneOrMoreMatches(cepEvents(spark, dir), "click",
      "purchase", oneDayUs, greedy = true, NoSkip))

  private val cepGreedySql = oneOrMoreCtes + """
    SELECT user_id, click_id AS first_click_id, n_clicks, purchase_id,
      date_trunc('second', cts) AS first_click_ts,
      date_trunc('second', pts) AS purchase_ts
    FROM g ORDER BY user_id, first_click_id, n_clicks, purchase_id"""

  /** q_cep_noskip — the same pattern, non-greedy, AFTER_MATCH_SKIP =
    * NO_SKIP: EVERY completed match emits — each armed start yields
    * one match per prefix of its captured run (a run of n clicks emits
    * n matches). The all-matches expansion is what the skip strategies
    * below prune; output is run-length-bounded, state identical to
    * greedy. */
  private def cepNoSkip(spark: SparkSession, dir: String): DataFrame =
    runProject(oneOrMoreMatches(cepEvents(spark, dir), "click",
      "purchase", oneDayUs, greedy = false, NoSkip))

  /** Oracle: one row per (start, run click) pair — prefix length by
    * click-number subtraction. */
  private val cepNoSkipSql = oneOrMoreCtes + """
    SELECT g.user_id AS user_id, g.click_id AS first_click_id,
      c2.cn - g.cn + 1 AS n_clicks, g.purchase_id,
      date_trunc('second', g.cts) AS first_click_ts,
      date_trunc('second', g.pts) AS purchase_ts
    FROM g JOIN c c2
      ON c2.user_id = g.user_id AND c2.cn >= g.cn AND c2.rn < g.prn
    ORDER BY user_id, first_click_id, n_clicks, purchase_id"""

  /** q_cep_skip_to_next — non-greedy with AFTER_MATCH_SKIP =
    * SKIP_TO_NEXT: of the matches sharing a start event, only the
    * FIRST (shortest prefix) emits — q_cep_noskip's expansion pruned
    * to one row per start. */
  private def cepSkipToNext(spark: SparkSession, dir: String): DataFrame =
    runProject(oneOrMoreMatches(cepEvents(spark, dir), "click",
      "purchase", oneDayUs, greedy = false, SkipToNext))

  private val cepSkipToNextSql = oneOrMoreCtes + """
    SELECT user_id, click_id AS first_click_id,
      CAST(1 AS BIGINT) AS n_clicks, purchase_id,
      date_trunc('second', cts) AS first_click_ts,
      date_trunc('second', pts) AS purchase_ts
    FROM g ORDER BY user_id, first_click_id, n_clicks, purchase_id"""

  /** q_cep_skip_past — greedy with AFTER_MATCH_SKIP =
    * SKIP_PAST_LAST_EVENT: after a match emits, every partial match it
    * overlaps is discarded, so each purchase emits at most ONE match —
    * the one anchored at the EARLIEST armed click — and emitted
    * matches never overlap. The non-overlapping report is the form a
    * 100 TB alerting pipeline actually pages on (one alert per
    * episode, not one per suffix). */
  private def cepSkipPast(spark: SparkSession, dir: String): DataFrame =
    runProject(oneOrMoreMatches(cepEvents(spark, dir), "click",
      "purchase", oneDayUs, greedy = true, SkipPastLastEvent))

  /** Oracle: the greedy match set reduced per purchase to its
    * earliest-start row. (The spine's first-purchase rule already
    * guarantees no purchase sits between an armed start and its match,
    * which is exactly the armed-at-that-purchase condition.) */
  private val cepSkipPastSql = oneOrMoreCtes + """
    SELECT user_id, arg_min(click_id, cn) AS first_click_id,
      arg_min(n_clicks, cn) AS n_clicks, purchase_id,
      date_trunc('second', arg_min(cts, cn)) AS first_click_ts,
      date_trunc('second', pts) AS purchase_ts
    FROM g GROUP BY user_id, purchase_id, pts
    ORDER BY user_id, first_click_id, n_clicks, purchase_id"""

  /** q_cep_until — `click.oneOrMore.until(view) followedBy purchase
    * within 1 day`: greedy extent, but a run stops absorbing clicks
    * at the first view after its start (flink-cep `until` — the
    * bounded-accumulation form that keeps a hot key's run from growing
    * with the corpus); the purchase still completes the match, and the
    * sentinel view is not part of it. */
  private def cepUntil(spark: SparkSession, dir: String): DataFrame =
    runProject(untilMatches(cepEvents(spark, dir), "click", "view",
      "purchase", oneDayUs))

  /** Oracle: the greedy count truncated at the first view after the
    * start (when that view precedes the resolving purchase). */
  private val cepUntilSql = oneOrMoreCtes + """
    SELECT s.user_id AS user_id, s.click_id AS first_click_id,
      (SELECT count(*) FROM c c2
       WHERE c2.user_id = s.user_id AND c2.rn >= s.crn
         AND c2.rn < least(coalesce(
           (SELECT min(v.rn) FROM o v
            WHERE v.user_id = s.user_id AND v.event_type = 'view'
              AND v.rn > s.crn), s.prn), s.prn)) AS n_clicks,
      s.purchase_id,
      date_trunc('second', s.cts) AS first_click_ts,
      date_trunc('second', s.pts) AS purchase_ts
    FROM spine s
    ORDER BY user_id, first_click_id, n_clicks, purchase_id"""

  val all: Seq[Q] = Seq(
    Q("q_cep_kleene", cepKleene _, cepKleeneSql),
    Q("q_cep_followedby", cepFollowedBy _, cepFollowedBySql),
    Q("q_cep_followedby_any", cepFollowedByAny _, cepFollowedByAnySql),
    Q("q_cep_times", cepTimes _, cepTimesSql),
    Q("q_cep_optional", cepOptional _, cepOptionalSql),
    Q("q_cep_absence", cepAbsence _, cepAbsenceSql),
    Q("q_cep_greedy", cepGreedy _, cepGreedySql),
    Q("q_cep_noskip", cepNoSkip _, cepNoSkipSql),
    Q("q_cep_skip_to_next", cepSkipToNext _, cepSkipToNextSql),
    Q("q_cep_skip_past", cepSkipPast _, cepSkipPastSql),
    Q("q_cep_until", cepUntil _, cepUntilSql))
}
