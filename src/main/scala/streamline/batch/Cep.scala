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
  private val cepKleeneSql = """
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

  val all: Seq[Q] = Seq(Q("q_cep_kleene", cepKleene _, cepKleeneSql))
}
