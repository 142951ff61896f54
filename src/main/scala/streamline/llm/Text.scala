package streamline.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import streamline.{Q, Tables}

/** §2.11 [C] text-analysis operators for a training-data pipeline:
  * token counting, quality scoring, corpus profiling, language-ID
  * heuristic, document fingerprinting.
  *
  * Everything here is a per-row projection or a keyed aggregation —
  * embarrassingly parallel, no driver-side loops, no global state — so
  * the same code runs unchanged on a 1000-executor cluster. Ratios are
  * single IEEE divisions of exact integer counts (deterministic across
  * engines); the one transcendental (tf-idf's ln) is output-only and
  * rounded, never used for ranking.
  */
object Text {

  /** One-shot latch for the non-default bm25Terms warning (the plan
    * constructor runs once per query build; same rationale as
    * Similarity.bandBitsWarned). */
  private val bm25TermsWarned =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  private def words(c: Column): Column = split(c, " ")

  /** q_llm_text_stats — tokenize + counts; also validates the n_chars
    * metadata column against the actual text length. */
  private def textStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        length($"text").as("len_chars"),
        size(words($"text")).as("n_words"),
        size(array_distinct(words($"text"))).as("n_uniq_words"),
        ($"n_chars" === length($"text")).as("meta_len_ok"))
      .orderBy($"doc_id")
  }

  private val textStatsSql = """
    SELECT doc_id,
      length(text) AS len_chars,
      len(string_split(text, ' ')) AS n_words,
      len(list_distinct(string_split(text, ' '))) AS n_uniq_words,
      n_chars = length(text) AS meta_len_ok
    FROM documents ORDER BY doc_id"""

  /** q_llm_quality — quality scoring: stopword ratio, type-token ratio,
    * average word length, length bucket. */
  private def quality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = words($"text")
    val nWords = size(w).cast("double")
    val nStop = size(filter(w,
      x => x.isin("the", "a", "of", "and", "to", "in"))).cast("double")
    val nUniq = size(array_distinct(w)).cast("double")
    Tables.documents(spark, dir)
      .select($"doc_id",
        (nStop / nWords).as("stop_ratio"),
        (nUniq / nWords).as("ttr"),
        ((length($"text") - (size(w) - 1)).cast("double") / nWords)
          .as("avg_word_len"),
        when(length($"text") < 200, "short")
          .when(length($"text") < 400, "medium")
          .otherwise("long").as("len_bucket"))
      .orderBy($"doc_id")
  }

  private val qualitySql = """
    WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS w
               FROM documents)
    SELECT doc_id,
      CAST(len(list_filter(w,
        x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE)
        / CAST(len(w) AS DOUBLE) AS stop_ratio,
      CAST(len(list_distinct(w)) AS DOUBLE)
        / CAST(len(w) AS DOUBLE) AS ttr,
      CAST(length(text) - (len(w) - 1) AS DOUBLE)
        / CAST(len(w) AS DOUBLE) AS avg_word_len,
      CASE WHEN length(text) < 200 THEN 'short'
           WHEN length(text) < 400 THEN 'medium'
           ELSE 'long' END AS len_bucket
    FROM d ORDER BY doc_id"""

  /** q_llm_lang_profile — corpus profiling: per (lang, source) volume
    * and size stats. */
  private def langProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").as("sum_chars"),
        sum(size(words($"text"))).as("sum_words"),
        min($"doc_id").as("first_doc"))
      .orderBy($"lang", $"source")
  }

  private val langProfileSql = """
    SELECT lang, source, count(*) AS n_docs,
      CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_words,
      min(doc_id) AS first_doc
    FROM documents GROUP BY lang, source ORDER BY lang, source"""

  /** q_llm_lang_id — marker-word language-ID heuristic (n-gram-class
    * detector): score each candidate language by marker hits, pick the
    * argmax with a fixed precedence tiebreak. Deterministic and fully
    * SQL-expressible, so it keeps an exact oracle. */
  private def langId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = words($"text")
    def score(markers: String*): Column =
      size(filter(w, x => x.isin(markers.map(lit): _*)))
    Tables.documents(spark, dir)
      .select($"doc_id", $"lang",
        score("the", "and", "of").as("sc_en"),
        score("der", "und", "die").as("sc_de"),
        score("le", "la", "et").as("sc_fr"))
      .withColumn("guessed",
        when($"sc_de" > $"sc_en" && $"sc_de" >= $"sc_fr", "de")
          .when($"sc_fr" > $"sc_en" && $"sc_fr" > $"sc_de", "fr")
          .otherwise("en"))
      .orderBy($"doc_id")
  }

  private val langIdSql = """
    WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS w
               FROM documents),
    s AS (SELECT doc_id, lang,
      len(list_filter(w, x -> x IN ('the','and','of'))) AS sc_en,
      len(list_filter(w, x -> x IN ('der','und','die'))) AS sc_de,
      len(list_filter(w, x -> x IN ('le','la','et'))) AS sc_fr
    FROM d)
    SELECT doc_id, lang, sc_en, sc_de, sc_fr,
      CASE WHEN sc_de > sc_en AND sc_de >= sc_fr THEN 'de'
           WHEN sc_fr > sc_en AND sc_fr > sc_de THEN 'fr'
           ELSE 'en' END AS guessed
    FROM s ORDER BY doc_id"""

  /** q_llm_lang_confusion — the EVALUATION HARNESS of a heuristic
    * classifier [C]: run a five-class marker detector over the
    * labeled corpus and report the (label × guess) confusion matrix
    * with per-label recall shares and hit flags — the
    * classifier-quality screen a pipeline runs before trusting any
    * heuristic filter at 100 TB. On THIS synthetic corpus the
    * per-language word distributions are statistically
    * indistinguishable, so the matrix honestly reads ~chance — which
    * is exactly the verdict the harness exists to deliver (a detector
    * must EARN its gate). Exactness: marker scores are integer
    * counts, the five-way argmax a strict CASE precedence chain
    * (en > de > es > fr > zh on ties — total, engine-identical),
    * share one [[streamline.batch.Aggregates.exactRound6]]. Scale:
    * one map-side-combined corpus pass to the ≤ langs² matrix; label
    * totals are a window over that matrix (never a second corpus
    * branch). */
  private def langConfusion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = words($"text")
    def score(markers: String*): Column =
      size(filter(w, x => x.isin(markers.map(lit): _*)))
    val g = Tables.documents(spark, dir)
      .select($"lang",
        score("order", "window", "table").as("sc_en"),
        score("customer", "hash", "big").as("sc_de"),
        score("agg", "slow").as("sc_es"),
        score("query", "scan", "data").as("sc_fr"),
        score("join", "fast").as("sc_zh"))
      .withColumn("guessed",
        when($"sc_de" > $"sc_en" && $"sc_de" >= $"sc_es" &&
          $"sc_de" >= $"sc_fr" && $"sc_de" >= $"sc_zh", "de")
          .when($"sc_es" > $"sc_en" && $"sc_es" > $"sc_de" &&
            $"sc_es" >= $"sc_fr" && $"sc_es" >= $"sc_zh", "es")
          .when($"sc_fr" > $"sc_en" && $"sc_fr" > $"sc_de" &&
            $"sc_fr" > $"sc_es" && $"sc_fr" >= $"sc_zh", "fr")
          .when($"sc_zh" > $"sc_en" && $"sc_zh" > $"sc_de" &&
            $"sc_zh" > $"sc_es" && $"sc_zh" > $"sc_fr", "zh")
          .otherwise("en"))
    val cm = g.groupBy($"lang", $"guessed").agg(count(lit(1)).as("c"))
    val n = sum($"c").over(Window.partitionBy($"lang"))
    cm.select($"lang", $"guessed", $"c", n.as("n_label"),
        streamline.batch.Aggregates.exactRound6($"c", n).as("share"),
        when($"lang" === $"guessed", 1L).otherwise(0L).as("hit"))
      .orderBy($"lang", $"guessed")
  }

  private val langConfusionSql = """
    WITH d AS (SELECT lang, string_split(text, ' ') AS w
               FROM documents),
    s AS (SELECT lang,
      len(list_filter(w, x -> x IN ('order','window','table'))) AS sc_en,
      len(list_filter(w, x -> x IN ('customer','hash','big'))) AS sc_de,
      len(list_filter(w, x -> x IN ('agg','slow'))) AS sc_es,
      len(list_filter(w, x -> x IN ('query','scan','data'))) AS sc_fr,
      len(list_filter(w, x -> x IN ('join','fast'))) AS sc_zh
    FROM d),
    g AS (SELECT lang,
      CASE WHEN sc_de > sc_en AND sc_de >= sc_es AND sc_de >= sc_fr
                AND sc_de >= sc_zh THEN 'de'
           WHEN sc_es > sc_en AND sc_es > sc_de AND sc_es >= sc_fr
                AND sc_es >= sc_zh THEN 'es'
           WHEN sc_fr > sc_en AND sc_fr > sc_de AND sc_fr > sc_es
                AND sc_fr >= sc_zh THEN 'fr'
           WHEN sc_zh > sc_en AND sc_zh > sc_de AND sc_zh > sc_es
                AND sc_zh > sc_fr THEN 'zh'
           ELSE 'en' END AS guessed
    FROM s),
    cm AS (SELECT lang, guessed, CAST(count(*) AS BIGINT) AS c
           FROM g GROUP BY 1, 2),
    t AS (SELECT lang, guessed, c,
        CAST(sum(c) OVER (PARTITION BY lang) AS BIGINT) AS n_label
      FROM cm)
    SELECT lang, guessed, c, n_label,
      """ + streamline.batch.Aggregates.exactRound6Sql("c", "n_label") +
    """ AS share,
      CAST(CASE WHEN lang = guessed THEN 1 ELSE 0 END AS BIGINT) AS hit
    FROM t ORDER BY lang, guessed"""

  /** q_llm_fingerprint — canonical bag-of-words fingerprint (sorted
    * distinct tokens → sha256): an order-insensitive document signature
    * for shuffled-near-dup detection; n_same counts fingerprint
    * collisions corpus-wide. */
  private def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val fp = sha2(concat_ws(" ",
      array_sort(array_distinct(words($"text")))), 256)
    Tables.documents(spark, dir)
      .select($"doc_id", fp.as("fp"))
      .withColumn("n_same", count(lit(1)).over(Window.partitionBy($"fp")))
      .orderBy($"doc_id")
  }

  private val fingerprintSql = """
    WITH d AS (SELECT doc_id,
      sha256(array_to_string(list_sort(list_distinct(
        string_split(text, ' '))), ' ')) AS fp
      FROM documents)
    SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS n_same
    FROM d ORDER BY doc_id"""

  /** q_llm_tokenize — BPE-ish token counting: regex pre-tokenization
    * (letter runs / digit runs / single other char — the GPT-2 pattern
    * class reduced to POSIX-safe classes shared by Java regex and RE2)
    * plus a subword-unit estimate of ⌈len/4⌉ per token (the "a BPE
    * token is ~4 chars" rule). Pure per-row projection — no shuffle. */
  private def tokenize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        regexp_extract_all($"text",
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)).as("toks"))
      .select($"doc_id",
        size($"toks").as("n_tokens"),
        size(array_distinct($"toks")).as("n_distinct"),
        aggregate($"toks", lit(0L),
          (acc, t) => acc + floor((length(t) + lit(3)) / lit(4)).cast("long"))
          .as("n_units"))
      .orderBy($"doc_id")
  }

  private val tokenizeSql = """
    WITH t AS (SELECT doc_id,
      regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]') AS toks
      FROM documents)
    SELECT doc_id, len(toks) AS n_tokens,
      len(list_distinct(toks)) AS n_distinct,
      CAST(list_sum(list_transform(toks, t -> (length(t)+3)//4)) AS BIGINT)
        AS n_units
    FROM t ORDER BY doc_id"""

  /** q_llm_winnow — winnowing fingerprints (the MOSS scheme): a rolling
    * polynomial hash over character 5-grams, then the minimum hash of
    * every 4-hash window; the distinct window-minima are the document's
    * fingerprint set (two documents sharing a long-enough substring are
    * guaranteed to share a fingerprint). The hash is plain integer math
    * (Σ ascii·31^j — no overflow at these sizes), so BOTH engines
    * compute identical values and the oracle is exact. Per-row
    * projection only — no shuffle. */
  private def winnow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 5
    val w = 4
    // Built entirely from zip_with over shifted slices so every array is
    // evaluated once per ROW — a lambda that re-reads the source column
    // per ELEMENT (transform(sequence(...), i => substring(text, i...)))
    // is O(chars²) per doc and was measured ~100× slower.
    def shifted(arr: Column, n: Int, j: Int, width: Column): Column =
      slice(arr, lit(1 + j), width)
    def horner(text: Column): Column = {
      val codes = transform(split(text, ""), c => ascii(c).cast("long"))
      val width = greatest(size(codes) - (k - 1), lit(0))
      (1 until k).foldLeft(shifted(codes, k, 0, width)) { (acc, j) =>
        zip_with(acc, shifted(codes, k, j, width),
          (a, c) => a * lit(31L) + c)
      }
    }
    def windowMins(hs: Column): Column = {
      val width = greatest(size(hs) - (w - 1), lit(0))
      (1 until w).foldLeft(shifted(hs, w, 0, width)) { (acc, j) =>
        zip_with(acc, shifted(hs, w, j, width), (a, b) => least(a, b))
      }
    }
    val fps = array_distinct(windowMins(horner($"text")))
    Tables.documents(spark, dir)
      .select($"doc_id", fps.as("fps"))
      .select($"doc_id", size($"fps").as("n_fp"),
        array_min($"fps").as("fp_min"), array_max($"fps").as("fp_max"))
      .orderBy($"doc_id")
  }

  /** Stop-fingerprint df cap for [[winnowPairs]], interpolated into
    * BOTH the Spark plan and the DuckDB oracle (the bpeChainSql
    * anti-drift pattern): fingerprints in more documents than this are
    * template/boilerplate, and at 100 TB they are also the join-skew
    * hot keys — pruning them is standard winnowing practice AND the
    * scale guard (per-fingerprint join fan-out ≤ cap²). */
  private val WINNOW_MAX_DF = 50

  /** q_llm_winnow_pairs — cross-document PARTIAL-overlap detection:
    * doc pairs sharing ≥ 3 winnowing fingerprints of their WORD
    * 3-gram sequence — the substring-duplication signal (Lee et al.
    * 2022's exact-substring dedup, approximated the way MOSS does it:
    * winnow the k-gram hash sequence, match fingerprints) that
    * whole-document Jaccard misses when only a paragraph is copied
    * [C]. Word 3-grams (not q_llm_winnow's char 5-grams — the
    * fixture's small character vocabulary saturates those) hashed to
    * md5 STRINGS in sequence order, window-min over 4 (lexicographic
    * min is a valid winnowing order on any engine — no numeric hash
    * to port), distinct per doc. Exactness: md5 and the lexicographic
    * min are identical on both engines; counts BIGINT. Scale: ONE
    * corpus pass to the checkpointed exploded fingerprint table (df
    * count + both join sides read it); stop-fingerprints
    * (df > WINNOW_MAX_DF) anti-joined away BEFORE the keyed self-join
    * on fingerprint — the hot-key guard — so candidate fan-out per
    * fingerprint is cap-bounded; ReuseExchange collapses the two
    * identical fp shuffles. */
  private def winnowPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def shifted(arr: Column, j: Int, width: Column): Column =
      slice(arr, lit(1 + j), width)
    val words = split($"text", " ")
    val gw = greatest(size(words) - 2, lit(0))
    val grams = zip_with(
      zip_with(shifted(words, 0, gw), shifted(words, 1, gw),
        (a, b) => concat(a, lit(" "), b)),
      shifted(words, 2, gw),
      (ab, c) => md5(concat(ab, lit(" "), c)))
    val staged = Tables.documents(spark, dir)
      .select($"doc_id", grams.as("hs"))
    val fw = greatest(size($"hs") - 3, lit(0))
    val fps = array_distinct((1 until 4).foldLeft(
      shifted($"hs", 0, fw)) { (acc, j) =>
      zip_with(acc, shifted($"hs", j, fw), (a, b) => least(a, b))
    })
    val f = staged.select($"doc_id", explode(fps).as("fp"))
      .localCheckpoint(true) // df count + both join sides read it
    val hot = f.groupBy($"fp").agg(count(lit(1)).as("nd"))
      .where($"nd" > WINNOW_MAX_DF).select($"fp")
    val kept = f.join(hot, Seq("fp"), "left_anti")
    kept.as("a").hint("shuffle_hash").join(kept.as("b"),
        $"a.fp" === $"b.fp" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where($"n_shared" >= 3)
      .orderBy($"id_a", $"id_b")
  }

  private val winnowPairsSql = s"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
               FROM documents),
    g AS (SELECT doc_id,
            list_transform(generate_series(1, greatest(len(w) - 2, 0)),
              i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS hs
          FROM w),
    f AS (SELECT doc_id, unnest(list_distinct(
            list_transform(generate_series(1, greatest(len(hs) - 3, 0)),
              x -> list_min(hs[x : x + 3])))) AS fp
          FROM g),
    df AS (SELECT fp, count(*) AS nd FROM f GROUP BY 1),
    kept AS (SELECT f.doc_id, f.fp FROM f JOIN df USING (fp)
             WHERE df.nd <= $WINNOW_MAX_DF),
    p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(count(*) AS BIGINT) AS n_shared
          FROM kept a JOIN kept b
            ON a.fp = b.fp AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
    SELECT * FROM p WHERE n_shared >= 3 ORDER BY id_a, id_b"""

  private val winnowSql = """
    WITH h AS (SELECT doc_id,
      list_transform(generate_series(1, greatest(length(text) - 4, 0)),
        i -> list_sum(list_transform(generate_series(0, 4),
          j -> ascii(substring(text, CAST(i + j AS INT), 1)) *
               ([923521, 29791, 961, 31, 1])[j + 1]))) AS hs
      FROM documents),
    f AS (SELECT doc_id, list_distinct(
            list_transform(generate_series(1, greatest(len(hs) - 3, 0)),
              x -> list_min(hs[x : x + 3]))) AS fps
          FROM h)
    SELECT doc_id, len(fps) AS n_fp,
      CAST(list_min(fps) AS BIGINT) AS fp_min,
      CAST(list_max(fps) AS BIGINT) AS fp_max
    FROM f ORDER BY doc_id"""

  /** q_llm_tfidf — corpus-weighted salient-term extraction (the TF-IDF
    * primitive of a training-data pipeline: dedup keys, topic tags,
    * quality features). Per document: top-3 terms ranked by
    * (tf DESC, df ASC, term ASC) — a purely INTEGER ordering (frequent
    * in the doc, rare in the corpus) so the ranking is bit-identical
    * across engines; the familiar `tf·ln(N/df)` score is emitted as an
    * output column only, 4-dp rounded (both engines' ln agree to ≤1 ulp
    * — safe under rounding, but never used to rank). Plan shape: a
    * single LINEAR pipeline — explode → tf aggregation → df as a
    * whole-partition window count over term → per-doc top-k window —
    * three keyed shuffles, zero joins. The earlier tf⋈dfreq join
    * evaluated the scan+explode+tf subplan on BOTH join sides (nothing
    * forced the exchanges to be identical, so ReuseExchange couldn't
    * collapse them — measured 2× the whole-query cost); a window count
    * is the df aggregation AND the join fused into one operator over one
    * shuffle. At 100 TB every stage is keyed (term, then doc_id), no
    * all-pairs anything, and nothing is computed twice. */
  private def tfidf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    // split-on-delimiter tokenization: identical token stream to
    // regexp_extract_all('[a-z]+') (the oracle's form) but measured ~4×
    // cheaper — a match-anywhere regex scans every suffix, a split regex
    // consumes the string once.
    val toks = docs.select($"doc_id",
      explode(split(lower($"text"), "[^a-z]+")).as("term"))
      .where($"term" =!= "")
    val tf = toks.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val ndocs = docs.agg(count(lit(1)).as("n_docs"))
    // df = how many docs contain the term = rows per term in tf: an
    // unbounded window count over the term partition — no second
    // aggregation, no self-join, tf's pipeline stays single-pass.
    val df = tf.withColumn("df",
      count(lit(1)).over(Window.partitionBy($"term")))
    val w = Window.partitionBy($"doc_id")
      .orderBy($"tf".desc, $"df".asc, $"term".asc)
    df.crossJoin(broadcast(ndocs))
      .withColumn("rk", row_number().over(w))
      .where($"rk" <= 3)
      .select($"doc_id", $"rk", $"term", $"tf", $"df",
        round($"tf" * log($"n_docs".cast("double") / $"df".cast("double")),
          4).as("score"))
      .orderBy($"doc_id", $"rk")
  }

  private val tfidfSql = """
    WITH toks AS (SELECT doc_id,
                    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
                  FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    nd AS (SELECT count(*) AS n_docs FROM documents),
    ranked AS (SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
                 row_number() OVER (PARTITION BY tf.doc_id
                   ORDER BY tf.tf DESC, dfreq.df ASC, tf.term ASC) AS rk
               FROM tf JOIN dfreq USING (term))
    SELECT doc_id, rk, term, tf, df,
      round(tf * ln(CAST((SELECT n_docs FROM nd) AS DOUBLE)
                    / CAST(df AS DOUBLE)), 4) AS score
    FROM ranked WHERE rk <= 3
    ORDER BY doc_id, rk"""

  /** q_llm_bm25 — BM25 retrieval scoring (Robertson/Spärck Jones; the
    * ranking function behind decontamination lookups and
    * retrieval-augmented data curation): score every document against a
    * fixed query-term set, return the top-10. k1=1.2, b=0.75, the
    * Lucene-style idf `ln((N-df+0.5)/(df+0.5)+1)`. Cross-engine
    * determinism (r15, libm-free at the row level): idf depends ONLY on
    * df, which takes ≤|Q| distinct values — so the single `ln` is
    * evaluated once per DISTINCT df on a |Q|-row side table, rounded to
    * 4 dp and cast DECIMAL(18,4) THERE, then joined back. Every per-row
    * operation after that is an IEEE basic op (×, ÷, +) over
    * bit-identical inputs — basic ops are correctly rounded by IEEE 754,
    * hence cross-engine exact — so a libm `ln` discrepancy in the
    * oracle engine can flip at most the |Q| pre-rounded idf literals
    * (each pinned far from its 4-dp boundary in Bm25Spec), never a
    * per-row contribution. Contributions are rounded to 4 dp and cast
    * DECIMAL(18,4) before the per-doc sum — the sum and the final
    * ranking are exact decimal arithmetic, so neither float summation
    * order nor 1-ulp drift can reorder the top-k (the ordering key is
    * (decimal score DESC, doc_id)).
    * Plan shape at scale: one explode pass feeds BOTH the per-doc length
    * aggregation and the tf aggregation; tf is pre-filtered to the
    * query-term set (|Q| terms), so everything after the first keyed agg
    * is sized `docs-containing-a-query-term × |Q|`, not corpus-sized. df
    * is a window count over that small set (tfidf's fused form — no
    * self-join); corpus stats are a 1-row broadcast probe; the final
    * rank is a global sort of the hit set only. */
  private def bm25(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val toks = docs.select($"doc_id",
      explode(split(lower($"text"), "[^a-z]+")).as("term"))
      .where($"term" =!= "")
    val lens = toks.groupBy($"doc_id").agg(count(lit(1)).as("len"))
    val stats = lens.agg(count(lit(1)).cast("long").as("n_docs"),
      (sum($"len").cast("double") / count(lit(1)).cast("double"))
        .as("avgdl"))
    // Query-term set from Knobs.bm25Terms (default matches the oracle;
    // ScalingCurveSpec overrides it to the blowup copies' vocabulary —
    // warn once on divergence, same contract as the LSH band knob).
    val terms = streamline.util.Knobs.bm25Terms(spark)
    if (terms != streamline.util.Knobs.bm25TermsDefault.split(",").toSeq &&
        !bm25TermsWarned.getAndSet(true))
      System.err.println(
        s"[graft] q_llm_bm25: graft.bm25.terms=${terms.mkString(",")} != " +
          s"default ${streamline.util.Knobs.bm25TermsDefault} — the " +
          "static DuckDB oracle no longer describes this run")
    val tf = toks.where($"term".isin(terms: _*))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val withDf = tf.withColumn("df",
      count(lit(1)).over(Window.partitionBy($"term")))
    // The ONLY transcendental, evaluated on a ≤|Q|-row table (distinct
    // df values) and frozen to DECIMAL(18,4) before any per-row math.
    val dfIdf = withDf.select($"df").distinct()
      .crossJoin(broadcast(stats.select($"n_docs")))
      .select($"df",
        round(
          log(($"n_docs".cast("double") - $"df".cast("double") + lit(0.5))
            / ($"df".cast("double") + lit(0.5)) + lit(1.0)),
          4).cast(DecimalType(18, 4)).as("idf"))
    val contrib = withDf.join(broadcast(dfIdf), "df")
      .join(lens, "doc_id").crossJoin(broadcast(stats))
      .select($"doc_id", $"len",
        round(
          $"idf".cast("double")
            * ($"tf".cast("double") * lit(2.2))
            / ($"tf".cast("double")
              + lit(1.2) * (lit(0.25)
                + lit(0.75) * $"len".cast("double") / $"avgdl")),
          4).cast(DecimalType(18, 4)).as("c"))
    val scored = contrib.groupBy($"doc_id")
      .agg(max($"len").as("len"), count(lit(1)).cast("long").as("n_hit"),
        sum($"c").cast(DecimalType(18, 4)).as("score"))
    // top-k FIRST via orderBy+limit — planned as TakeOrderedAndProject
    // (per-partition heap + driver merge, no single-partition shuffle of
    // the full hit set; on a query hitting most of the corpus that sort
    // would otherwise concentrate corpus-sized data on one task). The
    // rank window then runs over only the 10 surviving rows.
    val top = scored.orderBy($"score".desc, $"doc_id".asc).limit(10)
    top
      .withColumn("rk", row_number()
        .over(Window.orderBy($"score".desc, $"doc_id".asc)).cast("long"))
      .select($"rk", $"doc_id", $"len", $"n_hit", $"score")
      .orderBy($"rk")
  }

  private val bm25Sql = """
    WITH toks AS (SELECT doc_id,
                    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
                  FROM documents),
    lens AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY doc_id),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(len) AS DOUBLE)/CAST(count(*) AS DOUBLE) AS avgdl
              FROM lens),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term IN ('query','join','window') GROUP BY doc_id, term),
    dfreq AS (SELECT doc_id, term, tf,
                count(*) OVER (PARTITION BY term) AS df
              FROM tf),
    dfidf AS (SELECT df,
                CAST(round(
                  ln((CAST(s.n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                     / (CAST(df AS DOUBLE) + 0.5) + 1.0),
                  4) AS DECIMAL(18,4)) AS idf
              FROM (SELECT DISTINCT df FROM dfreq) CROSS JOIN stats s),
    contrib AS (
      SELECT d.doc_id, l.len,
        CAST(round(
          CAST(i.idf AS DOUBLE)
          * (CAST(d.tf AS DOUBLE) * 2.2)
          / (CAST(d.tf AS DOUBLE)
             + 1.2 * (0.25 + 0.75 * CAST(l.len AS DOUBLE) / s.avgdl)),
          4) AS DECIMAL(18,4)) AS c
      FROM dfreq d JOIN dfidf i ON d.df = i.df
        JOIN lens l ON d.doc_id = l.doc_id CROSS JOIN stats s),
    scored AS (SELECT doc_id, CAST(max(len) AS BIGINT) AS len,
                 CAST(count(*) AS BIGINT) AS n_hit,
                 CAST(sum(c) AS DECIMAL(18,4)) AS score
               FROM contrib GROUP BY doc_id),
    ranked AS (SELECT doc_id, len, n_hit, score,
                 CAST(row_number() OVER
                   (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rk
               FROM scored)
    SELECT rk, doc_id, len, n_hit, score FROM ranked
    WHERE rk <= 10 ORDER BY rk"""

  /** q_llm_heaps — Heaps'-law vocabulary growth curve: cumulative
    * distinct-vocabulary size vs cumulative token count as the corpus
    * is consumed in doc_id order, at BOTH gram orders (unigrams and
    * bigrams) — the corpus-diversity diagnostic (a saturating curve
    * flags a stale/duplicated crawl; V ≈ K·Nᵝ is the published law).
    * A token never contains a space (space-split), so gram order =
    * its space count + 1 and both orders travel one explode.
    * Exactness: pure integer counting — token cumsum and
    * first-occurrence ("new vocab") cumsum are BIGINT end to end.
    * Scale: ONE corpus pass to the (gram, doc) count table
    * (checkpointed — per-doc totals AND first-doc both read it, and
    * DAG branches re-execute lineage, the r15 plan-audit class);
    * first occurrence is a keyed min over grams; the two cumsum
    * windows run over the DOC-count-sized table partitioned by gram
    * order. Emitting every doc is the exactness baseline — a 100 TB
    * run checkpoints at log-spaced doc marks with the same shape. */
  private def heaps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ws = split($"text", " ")
    val bi = zip_with(
      slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
      (a, b) => concat(a, lit(" "), b))
    val dg = Tables.documents(spark, dir)
      .select($"doc_id", explode(concat(ws, bi)).as("gram"))
      .select($"doc_id", $"gram",
        size(split($"gram", " ")).cast("long").as("n"))
    val dw = dg.groupBy($"n", $"gram", $"doc_id")
      .agg(count(lit(1)).as("c")).localCheckpoint(true)
    val perdoc = dw.groupBy($"n", $"doc_id").agg(sum($"c").as("toks"))
    val newv = dw.groupBy($"n", $"gram").agg(min($"doc_id").as("fd"))
      .groupBy($"n", $"fd").agg(count(lit(1)).as("nw"))
      .select($"n".as("n2"), $"fd", $"nw")
    val w = Window.partitionBy($"n").orderBy($"doc_id".asc)
    perdoc.join(newv, $"n" === $"n2" && $"doc_id" === $"fd", "left")
      .select($"n".as("gram_n"), $"doc_id",
        sum($"toks").over(w).as("cum_tokens"),
        sum(coalesce($"nw", lit(0L))).over(w).as("vocab"))
      .orderBy($"gram_n", $"doc_id")
  }

  private val heapsSql = """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
          FROM documents),
    dg AS (
      SELECT doc_id, gram,
        CAST(len(string_split(gram, ' ')) AS BIGINT) AS n
      FROM (SELECT doc_id, unnest(ws) AS gram FROM w
            UNION ALL
            SELECT doc_id, ws[i] || ' ' || ws[i+1] AS gram
            FROM w, unnest(generate_series(1, len(ws) - 1)) AS t(i))),
    dw AS (SELECT n, gram, doc_id, CAST(count(*) AS BIGINT) AS c
          FROM dg GROUP BY 1, 2, 3),
    perdoc AS (SELECT n, doc_id, CAST(sum(c) AS BIGINT) AS toks
          FROM dw GROUP BY 1, 2),
    firstd AS (SELECT n, gram, min(doc_id) AS fd FROM dw GROUP BY 1, 2),
    newv AS (SELECT n, fd, CAST(count(*) AS BIGINT) AS nw
          FROM firstd GROUP BY 1, 2)
    SELECT p.n AS gram_n, p.doc_id,
      CAST(sum(p.toks) OVER pw AS BIGINT) AS cum_tokens,
      CAST(sum(coalesce(v.nw, 0)) OVER pw AS BIGINT) AS vocab
    FROM perdoc p LEFT JOIN newv v ON p.n = v.n AND p.doc_id = v.fd
    WINDOW pw AS (PARTITION BY p.n ORDER BY p.doc_id)
    ORDER BY gram_n, p.doc_id"""

  /** q_llm_vocab_overlap — cross-slice vocabulary overlap matrix: the
    * bigram-vocabulary Jaccard between every language pair — the
    * corpus-comparison diagnostic (near-1 overlap between slices that
    * claim to be different languages flags mislabeled or templated
    * data; it is also the redundancy screen between crawl snapshots).
    * Bigram vocab, not unigram — the unigram vocabulary saturates and
    * degenerates to 1.0 (the q_llm_heaps observation). Exactness:
    * set sizes BIGINT, |union| = n1+n2−|inter| in integers, Jaccard
    * one [[streamline.batch.Aggregates.exactRound6]]. Scale: ONE
    * corpus pass to the distinct (lang, gram) table (checkpointed —
    * per-lang sizes and the intersection join both read it); the
    * intersection self-join is keyed on gram over the VOCAB-sized
    * table (≪ corpus), output ≤ langs² rows. */
  private def vocabOverlap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ws = split($"text", " ")
    val bi = zip_with(
      slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
      (a, b) => concat(a, lit(" "), b))
    val dg = Tables.documents(spark, dir)
      .select($"lang", explode(bi).as("gram"))
      .distinct().localCheckpoint(true)
    val v = dg.groupBy($"lang").agg(count(lit(1)).as("nv"))
    val inter = dg.select($"lang".as("l1"), $"gram")
      .join(dg.select($"lang".as("l2"), $"gram".as("g2")),
        $"gram" === $"g2" && $"l1" < $"l2")
      .groupBy($"l1", $"l2").agg(count(lit(1)).as("ni"))
    inter
      .join(broadcast(v.select($"lang".as("vl1"), $"nv".as("n1"))),
        $"l1" === $"vl1")
      .join(broadcast(v.select($"lang".as("vl2"), $"nv".as("n2"))),
        $"l2" === $"vl2")
      .select($"l1", $"l2", $"n1", $"n2", $"ni",
        ($"n1" + $"n2" - $"ni").as("nu"),
        streamline.batch.Aggregates.exactRound6($"ni",
          $"n1" + $"n2" - $"ni").as("jaccard"))
      .orderBy($"l1", $"l2")
  }

  private val vocabOverlapSql = """
    WITH w AS (SELECT lang, string_split(text, ' ') AS ws
          FROM documents),
    dg AS (SELECT DISTINCT lang, ws[i] || ' ' || ws[i+1] AS gram
      FROM w, unnest(generate_series(1, len(ws) - 1)) AS t(i)),
    v AS (SELECT lang, CAST(count(*) AS BIGINT) AS nv FROM dg GROUP BY 1),
    inter AS (SELECT a.lang AS l1, b.lang AS l2,
        CAST(count(*) AS BIGINT) AS ni
      FROM dg a JOIN dg b ON a.gram = b.gram AND a.lang < b.lang
      GROUP BY 1, 2)
    SELECT i.l1, i.l2, v1.nv AS n1, v2.nv AS n2, i.ni,
      CAST(v1.nv + v2.nv - i.ni AS BIGINT) AS nu,
      """ + streamline.batch.Aggregates.exactRound6Sql(
        "i.ni", "v1.nv + v2.nv - i.ni") + """ AS jaccard
    FROM inter i JOIN v v1 ON i.l1 = v1.lang JOIN v v2 ON i.l2 = v2.lang
    ORDER BY i.l1, i.l2"""

  /** q_llm_rarity — token-rarity quality scoring (the rank-based
    * counterpart of an LM-perplexity filter, CCNet-style, without the
    * cross-engine hazard of libm `ln`): every token gets its corpus
    * frequency DENSE RANK (1 = most common), and a document's score is
    * its mean token rank — high mean rarity flags gibberish/rare-token
    * soup, low flags boilerplate. All integer counts + one exact
    * decimal-sum division ⇒ hash-exact. Scale: the rank table is
    * VOCABULARY-sized (≪ corpus; the global rank window sorts only the
    * vocab) and is broadcast into the token join, so the corpus side
    * never shuffles for the scoring pass. */
  private def rarity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", explode(split($"text", " ")).as("word"))
      .where($"word" =!= "")
    val ranks = toks.groupBy($"word").agg(count(lit(1)).as("n"))
      .select($"word", dense_rank().over(
        org.apache.spark.sql.expressions.Window
          .orderBy($"n".desc, $"word".asc)).as("rnk"))
    toks.join(broadcast(ranks), "word")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (sum($"rnk").cast("double") / count(lit(1))).as("mean_rarity"))
      .orderBy($"doc_id")
  }

  private val raritySql = """
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                  FROM documents),
    t AS (SELECT doc_id, word FROM toks WHERE word <> ''),
    r AS (SELECT word, dense_rank() OVER (ORDER BY count(*) DESC, word ASC)
            AS rnk
          FROM t GROUP BY word)
    SELECT doc_id, count(*) AS n_tokens,
      CAST(sum(rnk) AS DOUBLE) / count(*) AS mean_rarity
    FROM t JOIN r USING (word)
    GROUP BY doc_id ORDER BY doc_id"""

  /** q_llm_source_entropy — per-source language-mix Shannon entropy
    * (bits): a single-language crawl scores 0, a uniform k-language
    * mix log₂ k — the crawl-HOMOGENEITY screen (mixed-language
    * sources need language-aware routing before training) that
    * q_agg_entropy's scaladoc names as the corpus-diversity
    * instantiation of its statistic, and the scalar summary of
    * q_llm_lang_profile's (lang, source) volume table [C].
    * Exactness: the q_agg_entropy discipline verbatim — ln once per
    * DISTINCT INTEGER on the tiny side table, rounded there to
    * L₄ = round(10⁴·ln v); numerator Σ c·(L₄(n) − L₄(c)) exact
    * BIGINT; ln 2 the literal 6931; entropy ONE
    * [[streamline.batch.Aggregates.exactRound6]] over (num4,
    * n·6931). Scale: ONE map-side-combined corpus pass to the
    * checkpointed (source, lang) count table; everything after is
    * sources×langs-sized with value-distinct broadcasts. */
  private def sourceEntropy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ct = Tables.documents(spark, dir)
      .groupBy($"source", $"lang").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // totals + distinct values + join read it
    val tot = ct.groupBy($"source")
      .agg(sum($"c").as("n"), count(lit(1)).as("k"))
      .localCheckpoint(true) // distinct values + two joins read it
    val vals = ct.select($"c".as("v")).distinct()
      .union(tot.select($"n".as("v"))).distinct()
    val l = vals.select($"v",
      round(log($"v") * 10000).cast("long").as("l4"))
    val num = ct
      .join(broadcast(l.select($"v".as("c"), $"l4".as("lc"))), "c")
      .join(tot.select($"source", $"n"), "source")
      .join(broadcast(l.select($"v".as("n"), $"l4".as("ln4"))), "n")
      .groupBy($"source")
      .agg(sum($"c" * ($"ln4" - $"lc")).as("num4"))
    tot.join(num, "source")
      .select($"source", $"n".as("n_docs"), $"k".as("n_langs"),
        $"num4",
        streamline.batch.Aggregates.exactRound6($"num4",
          $"n" * lit(6931L)).as("entropy_bits"))
      .orderBy($"source")
  }

  private val sourceEntropySql = """
    WITH ct AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2),
    tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
        CAST(count(*) AS BIGINT) AS k FROM ct GROUP BY 1),
    vals AS (SELECT DISTINCT c AS v FROM ct
             UNION SELECT DISTINCT n FROM tot),
    l AS (SELECT v, CAST(round(ln(v) * 10000) AS BIGINT) AS l4
          FROM vals),
    num AS (SELECT ct.source,
        CAST(sum(ct.c * (ln4.l4 - lc.l4)) AS BIGINT) AS num4
      FROM ct JOIN l lc ON lc.v = ct.c
        JOIN tot t ON t.source = ct.source
        JOIN l ln4 ON ln4.v = t.n
      GROUP BY 1)
    SELECT t.source, t.n AS n_docs, t.k AS n_langs, num.num4,
      """ + streamline.batch.Aggregates.exactRound6Sql("num.num4",
        "t.n::HUGEINT * 6931") + """ AS entropy_bits
    FROM tot t JOIN num USING (source)
    ORDER BY t.source"""

  /** q_llm_kl_matrix — cross-source unigram KL divergence matrix:
    * KL(a‖b) over Laplace-smoothed word distributions for every
    * ordered source pair — the corpus-mix divergence number dataset
    * cards quote ("how different is crawl A's language from crawl
    * B's"), directly feeding the q_llm_mix / q_llm_dsir weighting
    * decisions; the vocabulary-level complement of q_agg_psi's
    * binned value drift and q_llm_vocab_overlap's set view (KL
    * weights the overlap by probability mass, and its ASYMMETRY
    * distinguishes "a is a subset of b" from the reverse). Exactness:
    * the q_agg_psi discipline — smoothed p = (c+1)/(n+V) makes
    * ln(p_a/p_b) a FOUR-term difference of L₄ = round(10⁴·ln v)
    * values over DISTINCT INTEGERS (one side table, one ln per
    * distinct count), and weighting by p_a over the common
    * denominator n_a+V makes KL·(n_a+V)·10⁴ = Σ(c_a+1)·L₄diff an
    * exact integer carried in DECIMAL(38), emitted as its digit
    * string; KL is ONE
    * [[streamline.batch.Aggregates.exactRound6]]. Scale: one corpus
    * pass to the (source, word) count table; the grid, side table and
    * pair join are all vocabulary-sized (×sources², which is tiny) —
    * the corpus is never rescanned. */
  private def klMatrix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def d38(c: Column) = c.cast("decimal(38,0)")
    val wc = Tables.documents(spark, dir)
      .select($"source", explode(split($"text", " ")).as("word"))
      .where($"word" =!= "")
      .groupBy($"source", $"word").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // vocab, totals and the grid read it
    val vocab = wc.select($"word").distinct()
      .localCheckpoint(true) // grid spine + V-count read it
    val vCount = vocab.agg(count(lit(1)).as("v"))
    val n = wc.groupBy($"source").agg(sum($"c").as("n"))
    val grid = wc.select($"source").distinct().crossJoin(vocab)
      .join(wc, Seq("source", "word"), "left")
      .select($"source", $"word", coalesce($"c", lit(0L)).as("c"))
      .join(broadcast(n), "source")
      .crossJoin(broadcast(vCount))
      .select($"source", $"word", $"c", ($"n" + $"v").as("nv"))
      .localCheckpoint(true) // side table + both pair sides read it
    val l = grid.select(($"c" + 1).as("v"))
      .union(grid.select($"nv".as("v"))).distinct()
      .select($"v", round(log($"v") * 10000).cast("long").as("l4"))
      .localCheckpoint(true) // four broadcast branches read it
    def side(tag: String) = grid
      .join(broadcast(l.select($"v".as("vc"), $"l4".as("lc"))),
        $"vc" === $"c" + 1)
      .join(broadcast(l.select($"v".as("vn"), $"l4".as("ln"))),
        $"vn" === $"nv")
      .select($"source".as(s"src_$tag"), $"word",
        $"c".as(s"c_$tag"), $"nv".as(s"nv_$tag"),
        ($"lc" - $"ln").as(s"l_$tag"))
    val terms = side("a").hint("shuffle_hash")
      .join(side("b"), Seq("word"))
      .where($"src_a" =!= $"src_b")
      .groupBy($"src_a", $"src_b")
      .agg(max($"nv_a").as("nva"),
        sum(d38($"c_a" + 1) * ($"l_a" - $"l_b")).as("num4"))
    terms.select($"src_a", $"src_b",
        $"num4".cast("string").as("kl_num"),
        streamline.batch.Aggregates.exactRound6($"num4",
          d38($"nva") * lit(10000L)).as("kl"))
      .orderBy($"src_a", $"src_b")
  }

  private val klMatrixSql = """
    WITH wc AS (SELECT source, word, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT source, unnest(string_split(text, ' ')) AS word
            FROM documents)
      WHERE word <> '' GROUP BY 1, 2),
    vocab AS (SELECT DISTINCT word FROM wc),
    vc AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
    n AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM wc
          GROUP BY 1),
    grid AS (SELECT s.source, w.word, coalesce(wc.c, 0) AS c,
        n.n + vc.v AS nv
      FROM (SELECT DISTINCT source FROM wc) s
      CROSS JOIN vocab w
      LEFT JOIN wc ON wc.source = s.source AND wc.word = w.word
      JOIN n ON n.source = s.source CROSS JOIN vc),
    l AS (SELECT v, CAST(round(ln(v) * 10000) AS BIGINT) AS l4 FROM
      (SELECT DISTINCT c + 1 AS v FROM grid
       UNION SELECT DISTINCT nv FROM grid)),
    sides AS (SELECT g.source, g.word, g.c, g.nv,
        lc.l4 - ln.l4 AS ldiff
      FROM grid g JOIN l lc ON lc.v = g.c + 1
                  JOIN l ln ON ln.v = g.nv),
    t AS (SELECT a.source AS src_a, b.source AS src_b,
        max(a.nv) AS nva,
        sum((a.c + 1)::HUGEINT * (a.ldiff - b.ldiff)) AS num4
      FROM sides a JOIN sides b ON a.word = b.word
        AND a.source != b.source
      GROUP BY 1, 2)
    SELECT src_a, src_b, CAST(num4 AS VARCHAR) AS kl_num,
      """ + streamline.batch.Aggregates.exactRound6Sql("num4",
        "nva::HUGEINT * 10000") + """ AS kl
    FROM t ORDER BY src_a, src_b"""

  /** q_llm_burstiness — per-word burstiness (Church–Gale): the
    * variance-to-mean ratio of a word's per-document counts over ALL
    * corpus documents (absent = 0) — VMR ≈ 1 marks Poisson "function
    * word" behavior, VMR ≫ 1 marks content words that arrive in
    * bursts; the standard corpus-linguistics axis that q_llm_zipf
    * (rank–frequency) and q_llm_heaps (vocabulary growth) do not
    * capture, and a practical stopword/keyword discriminator for
    * quality scoring. Exactness: VMR = (n·Σx² − (Σx)²)/(n·Σx) with
    * all moments exact integers in DECIMAL(38) (zeros contribute
    * nothing, so NO densification is needed — just the 1-row doc
    * count), the numerator ≥ 0 by Cauchy–Schwarz, both witnesses out
    * as digit strings and the ratio ONE
    * [[streamline.batch.Aggregates.exactRound6]] over the fraction
    * reduced by a shared power of ten (den → ≤14 digits; VMR is
    * bounded by the max per-doc count ≤ 10⁴, so the trimmed numerator
    * stays long-safe; exact until den > 10¹⁴, ≤10⁻¹³ relative past —
    * the q_win_acf/reducedR2 class). Scale: one corpus explode →
    * map-side-combined (word, doc) count → word-keyed rollup; output
    * is vocabulary-sized (at 100 TB a df floor bounds the emission —
    * the q_llm_df_prune cut). */
  private def burstiness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def d38(c: Column) = c.cast("decimal(38,0)")
    val wc = Tables.documents(spark, dir)
      .select($"doc_id", explode(split($"text", " ")).as("word"))
      .where($"word" =!= "")
      .groupBy($"word", $"doc_id").agg(count(lit(1)).as("c"))
    val nDocs = Tables.documents(spark, dir).agg(count(lit(1)).as("n"))
    val m = wc.groupBy($"word").agg(count(lit(1)).as("df"),
        sum($"c").as("tf"), sum(d38($"c") * $"c").as("tf2"))
      .crossJoin(broadcast(nDocs))
    val num = d38($"n") * $"tf2" - d38($"tf") * $"tf"
    val den = d38($"n") * $"tf"
    def pow10(kc: Column) =
      concat(lit("1"), call_function("repeat", lit("0"),
        kc.cast("int"))).cast("decimal(38,0)")
    val j = greatest(lit(0), length(den.cast("string")) - lit(14))
    val numR = d38(call_function("div", num, pow10(j)))
    val denR = d38(call_function("div", den, pow10(j)))
    m.select($"word", $"df", $"tf",
        num.cast("string").as("vmr_num"),
        den.cast("string").as("vmr_den"),
        streamline.batch.Aggregates.exactRound6(numR, denR).as("vmr"))
      .orderBy($"word")
  }

  private val burstinessSql = """
    WITH wc AS (SELECT word, doc_id, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents)
      WHERE word <> '' GROUP BY 1, 2),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    m AS (SELECT word, CAST(count(*) AS BIGINT) AS df,
        CAST(sum(c) AS BIGINT) AS tf, sum(c::HUGEINT * c) AS tf2
      FROM wc GROUP BY 1),
    b AS (SELECT word, df, tf,
        nd.n::HUGEINT * tf2 - tf::HUGEINT * tf AS num,
        nd.n::HUGEINT * tf AS den
      FROM m CROSS JOIN nd),
    red AS (SELECT word, df, tf, num, den,
        CAST(concat('1', repeat('0', CAST(greatest(0,
          length(CAST(den AS VARCHAR)) - 14) AS INTEGER)))
          AS HUGEINT) AS p
      FROM b)
    SELECT word, df, tf, CAST(num AS VARCHAR) AS vmr_num,
      CAST(den AS VARCHAR) AS vmr_den,
      """ + streamline.batch.Aggregates.exactRound6Sql(
        "num // p", "den // p") + """ AS vmr
    FROM red ORDER BY word"""

  /** q_llm_zipf — per-language rank–frequency (Zipf) profile in
    * OCTAVES: word frequencies ranked inside each language
    * (row_number over (n DESC, word) — a total tie order), ranks
    * binned into octaves o = ⌊log₂ rank⌋ computed EXACTLY as
    * `length(bin(rank)) − 1` (integer bit-length in both engines, no
    * float log on the grouping path), then per octave the type count
    * and total token mass. For a Zipf exponent s the octave mass
    * scales as 2^{o(1−s)}, so the per-octave exponent estimate is
    * s = 1 − log₂(massₒ/massₒ₋₁) — the ONE transcendental, applied to
    * an exact integer ratio on the OUTPUT only and rounded to 4 dp
    * (the tf-idf ln discipline). Scale: corpus contributes one keyed
    * (lang, word) count; everything after runs on the vocabulary
    * table, whose per-language window sort is vocab-sized, not
    * corpus-sized. */
  private def zipf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val freqs = Tables.documents(spark, dir)
      .select($"lang", explode(split($"text", " ")).as("word"))
      .where($"word" =!= "")
      .groupBy($"lang", $"word").agg(count(lit(1)).as("n"))
    val ranked = freqs.select($"lang", $"n",
      row_number().over(Window.partitionBy($"lang")
        .orderBy($"n".desc, $"word".asc)).as("rnk"))
    val prof = ranked
      .select($"lang", $"n", (length(bin($"rnk")) - 1).as("octave"))
      .groupBy($"lang", $"octave")
      .agg(count(lit(1)).as("n_types"), sum($"n").as("sum_freq"))
    val w = Window.partitionBy($"lang").orderBy($"octave")
    prof
      .select($"lang", $"octave", $"n_types", $"sum_freq",
        lag($"sum_freq", 1).over(w).as("prev_freq"))
      .select($"lang", $"octave", $"n_types", $"sum_freq",
        round(lit(1.0) - log2($"sum_freq".cast("double") /
          $"prev_freq".cast("double")), 4).as("zipf_exp"))
      .orderBy($"lang", $"octave")
  }

  private val zipfSql = """
    WITH toks AS (SELECT lang, unnest(string_split(text, ' ')) AS word
                  FROM documents),
    f AS (SELECT lang, word, count(*) AS n FROM toks WHERE word <> ''
          GROUP BY lang, word),
    r AS (SELECT lang, n, row_number() OVER (PARTITION BY lang
            ORDER BY n DESC, word ASC) AS rnk FROM f),
    p AS (SELECT lang, length(bin(rnk)) - 1 AS octave,
            count(*) AS n_types, CAST(sum(n) AS BIGINT) AS sum_freq
          FROM r GROUP BY lang, octave),
    l AS (SELECT lang, octave, n_types, sum_freq,
            lag(sum_freq) OVER (PARTITION BY lang ORDER BY octave)
              AS prev_freq FROM p)
    SELECT lang, octave, n_types, sum_freq,
      round(1 - log2(CAST(sum_freq AS DOUBLE) / CAST(prev_freq AS DOUBLE)),
        4) AS zipf_exp
    FROM l ORDER BY lang, octave"""

  /** q_llm_novelty — first-occurrence n-gram novelty: the fraction of
    * each document's 3-gram shingles whose FIRST corpus occurrence
    * (smallest doc_id) is this document — the incremental-content
    * curve data curation uses to decide when more of a source stops
    * adding information (the complement of memorized/boilerplate
    * mass). Distinct from q_llm_selfrepeat (intra-doc repetition) and
    * q_llm_dedup_span (cross-doc span coverage): novelty is keyed on
    * the gram's global first sighting. Scale: one corpus-sized explode
    * → keyed min per gram → join back on gram — the same shuffle
    * class as every shingle operator here; ratios are exact integer
    * pairs divided once. */
  private def novelty(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val grams = Tables.documents(spark, dir)
      .select($"doc_id",
        explode(streamline.llm.Dedup.shingles3($"text")).as("gram"))
    val firstSeen = grams.groupBy($"gram").agg(min($"doc_id").as("first_doc"))
    grams.join(firstSeen, "gram")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"first_doc" === $"doc_id", 1L).otherwise(0L))
          .as("n_novel"))
      .select($"doc_id", $"n_grams", $"n_novel",
        ($"n_novel".cast("double") / $"n_grams").as("novelty"))
      .orderBy($"doc_id")
  }

  private val noveltySql = """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (SELECT doc_id, unnest(list_transform(
            generate_series(1, len(w) - 2),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
          FROM w),
    fs AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram)
    SELECT doc_id, count(*) AS n_grams,
      CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
        AS n_novel,
      CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS DOUBLE)
        / count(*) AS novelty
    FROM g JOIN fs USING (gram)
    GROUP BY doc_id ORDER BY doc_id"""

  /** q_llm_selfrepeat — intra-document repetition (the duplicate-n-gram
    * fraction of Gopher-style quality rules): 1 − distinct/total over a
    * doc's 3-gram shingles; near-1 flags looping/boilerplate text that
    * inter-document dedup never sees. Pure per-row projection — array
    * ops on each row, no shuffle at any scale; the ratio is an exact
    * integer pair divided once in double (IEEE-identical both engines). */
  private def selfRepeat(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = streamline.llm.Dedup.shingles3($"text")
    Tables.documents(spark, dir)
      .select($"doc_id",
        size(sh).cast("long").as("n_grams"),
        size(array_distinct(sh)).cast("long").as("n_distinct"))
      .where($"n_grams" > 0)
      .select($"doc_id", $"n_grams", $"n_distinct",
        (lit(1.0d) - $"n_distinct".cast("double") /
          $"n_grams".cast("double")).as("repeat_frac"))
      .orderBy($"doc_id")
  }

  private val selfRepeatSql = """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (SELECT doc_id,
            list_transform(generate_series(1, len(w) - 2),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS grams
          FROM w)
    SELECT doc_id, len(grams) AS n_grams,
      len(list_distinct(grams)) AS n_distinct,
      1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
          / CAST(len(grams) AS DOUBLE) AS repeat_frac
    FROM g WHERE len(grams) > 0
    ORDER BY doc_id"""

  /** q_llm_gopher — the Gopher quality-filter rule set (Rae et al. 2021,
    * "Scaling Language Models", App. A.1.1) as one per-row projection:
    * word-count bounds, mean word length, symbol-to-word ratio (# and
    * ellipsis), bullet-line ratio, alphabetic-word fraction, and the
    * ≥2-stop-words screen. Every metric is an exact integer count; each
    * ratio is a single IEEE division of those counts, so the pass flag
    * compares identically across engines (§2.12). Per-row ⇒ trivially
    * data-parallel at 100 TB; mean word length uses the O(n)
    * chars-minus-spaces identity, never a per-element lambda sum. */
  private def gopher(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = words($"text")
    val nWords = size(w)
    val nw = nWords.cast("double")
    val meanLen =
      (length($"text") - (nWords - 1)).cast("double") / nw
    val nSym = (length($"text")
      - length(regexp_replace($"text", "#|\\.\\.\\.", ""))).cast("double")
    val lines = split($"text", "\n")
    val nBullet = size(filter(lines,
      l => trim(l).startsWith("-") || trim(l).startsWith("*")))
    val nAlpha = size(filter(w, x => x.rlike("^[a-z]+$")))
    val nStop = size(filter(w,
      x => x.isin("the", "a", "of", "and", "to", "in")))
    Tables.documents(spark, dir)
      .select($"doc_id", nWords.as("n_words"), meanLen.as("mean_word_len"),
        (nSym / nw).as("symbol_ratio"),
        (nBullet.cast("double") / size(lines).cast("double"))
          .as("bullet_ratio"),
        (nAlpha.cast("double") / nw).as("frac_alpha"),
        nStop.as("stop_hits"))
      .withColumn("keep",
        $"n_words" >= 50 && $"n_words" <= 100000 &&
        $"mean_word_len" >= 3.0 && $"mean_word_len" <= 10.0 &&
        $"symbol_ratio" < 0.1 && $"bullet_ratio" < 0.9 &&
        $"frac_alpha" > 0.8 && $"stop_hits" >= 2)
      .orderBy($"doc_id")
  }

  private val gopherSql = """
    WITH m AS (
      SELECT doc_id,
        len(string_split(text, ' ')) AS n_words,
        CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
          / len(string_split(text, ' ')) AS mean_word_len,
        CAST(length(text) - length(regexp_replace(text, '#|\.\.\.', '', 'g'))
          AS DOUBLE) / len(string_split(text, ' ')) AS symbol_ratio,
        CAST(len(list_filter(string_split(text, chr(10)),
               l -> trim(l) LIKE '-%' OR trim(l) LIKE '*%')) AS DOUBLE)
          / len(string_split(text, chr(10))) AS bullet_ratio,
        CAST(len(list_filter(string_split(text, ' '),
               x -> regexp_full_match(x, '[a-z]+'))) AS DOUBLE)
          / len(string_split(text, ' ')) AS frac_alpha,
        len(list_filter(string_split(text, ' '),
          x -> x IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS stop_hits
      FROM documents)
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_ratio,
      frac_alpha, stop_hits,
      (n_words >= 50 AND n_words <= 100000
        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        AND symbol_ratio < 0.1 AND bullet_ratio < 0.9
        AND frac_alpha > 0.8 AND stop_hits >= 2) AS keep
    FROM m ORDER BY doc_id"""

  /** q_llm_chunk — overlapping token-window chunking (context-window
    * packing prep): token windows of 32 with stride 24, one output row
    * per chunk. The chunk starts are enumerated with `sequence` over the
    * token COUNT (an int range, never a per-token scan) and each chunk
    * is a single `slice` + `array_join` — O(tokens × size/stride) work
    * per row, no lambda re-evaluation. Scale: pure projection+generate;
    * the explode multiplies rows by ~n/stride, exactly the output size,
    * so nothing is amplified beyond the result itself. */
  private def chunk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val size32 = 32
    val stride = 24
    val w = words($"text")
    Tables.documents(spark, dir)
      .select($"doc_id", w.as("toks"))
      .select($"doc_id", $"toks",
        explode(sequence(lit(0),
          floor((size($"toks") - 1).cast("double") / stride).cast("int")))
          .as("k"))
      .select($"doc_id", $"k".as("chunk_id"),
        least(size($"toks") - $"k" * stride, lit(size32)).as("n_tokens"),
        array_join(slice($"toks", $"k" * stride + 1, lit(size32)), " ")
          .as("chunk_text"))
      .orderBy($"doc_id", $"chunk_id")
  }

  private val chunkSql = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    k AS (SELECT doc_id, toks,
            unnest(generate_series(0, CAST(floor((len(toks) - 1) / 24.0)
              AS INT))) AS chunk_id
          FROM t)
    SELECT doc_id, chunk_id,
      least(len(toks) - chunk_id * 24, 32) AS n_tokens,
      array_to_string(toks[chunk_id * 24 + 1 : chunk_id * 24 + 32],
        ' ') AS chunk_text
    FROM k ORDER BY doc_id, chunk_id"""

  /** q_llm_bigram_lm — corpus bigram language-model scoring (the
    * CCNet/KenLM-style quality signal: how "typical" of the corpus is
    * this document?): per document, the mean MLE conditional
    * probability P(w2|w1) = c(w1,w2)/c(w1·) of its bigrams, with the
    * counts estimated over the WHOLE corpus.
    *
    * Scale shape: the bigram stream is materialized once
    * (localCheckpoint — it feeds the count aggregation and the probe
    * join; at 100 TB: a persisted intermediate). The model tables are
    * vocabulary-sized, orders of magnitude below the corpus, so both
    * joins BROADCAST — the per-doc scoring pass never shuffles; only
    * the model aggregation does, keyed by bigram.
    *
    * Determinism: each probability is rounded to 9 dp (HALF_UP ≡
    * round-half-away for positives; exact half-boundaries only arise
    * from power-of-two quotients where both engines agree) and summed
    * in exact DECIMAL before one final double division. */
  private def bigramLm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    lmScores(spark, dir).orderBy($"doc_id")
  }

  /** The per-doc scoring pipeline of [[bigramLm]], shared with
    * q_llm_ppl_bucket (llm/Vocab.scala) so the CCNet bucketing is
    * guaranteed to rank the EXACT doubles the scoring query emits. */
  private[llm] def lmScores(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = expr("filter(split(text, ' '), x -> x <> '')")
    val big = Tables.documents(spark, dir)
      .select($"doc_id", toks.as("t"))
      .select($"doc_id", explode(expr(
        """zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),
           (a, b) -> struct(a, b))""")).as("bg"))
      .select($"doc_id", $"bg.a".as("w1"), $"bg.b".as("w2"))
      .localCheckpoint(true)
    val cb = big.groupBy($"w1", $"w2").agg(count(lit(1)).as("c_ab"))
    val ca = cb.groupBy($"w1").agg(sum($"c_ab").as("c_a"))
    val p = round($"c_ab".cast("double") / $"c_a".cast("double"), 9)
    big.join(broadcast(cb), Seq("w1", "w2"))
      .join(broadcast(ca), Seq("w1"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        (streamline.util.Det.asDouble(sum(p.cast(DecimalType(12, 9)))) /
          count(lit(1)).cast("double")).as("lm_score"))
  }

  private val bigramLmSql = """
    WITH t AS (SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x <> '') AS t
               FROM documents),
    b AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
          FROM t, UNNEST(generate_series(1, len(t) - 1)) AS u(i)),
    cb AS (SELECT w1, w2, count(*) AS c_ab FROM b GROUP BY w1, w2),
    ca AS (SELECT w1, sum(c_ab) AS c_a FROM cb GROUP BY w1)
    SELECT doc_id, count(*) AS n_bigrams,
      CAST(sum(CAST(round(c_ab / c_a, 9) AS DECIMAL(12,9))) AS DOUBLE)
        / count(*) AS lm_score
    FROM b JOIN cb USING (w1, w2) JOIN ca USING (w1)
    GROUP BY doc_id ORDER BY doc_id"""

  /** q_llm_bpe_pairs — one round of BPE tokenizer training: the
    * adjacent-symbol pair frequencies over the corpus (symbols =
    * characters on the first round), top-20 merge candidates. This is
    * THE inner loop of byte-pair-encoding vocabulary construction
    * (Sennrich et al. 2016): each round counts all adjacent pairs and
    * merges the most frequent. The pair extraction is pure codegen —
    * `transform(sequence(...))` over each word, no UDF — then one
    * keyed count; at 100 TB the pair space is tiny (|alphabet|² per
    * round) so the aggregate collapses map-side and the top-20 is a
    * TakeOrdered, never a full sort. Deterministic: tie-break on the
    * pair string. */
  private val BPE_MERGES = 10

  /** q_llm_bpe_train — the FULL BPE tokenizer-training loop (Sennrich
    * et al. 2016), extending q_llm_bpe_pairs (one round of pair
    * counting) to the real iterative algorithm: start from per-word
    * character sequences, and for 10 rounds count adjacent symbol
    * pairs corpus-wide (weighted by word frequency), merge the most
    * frequent pair (ties: lexicographic), and apply the merge
    * greedily left-to-right to every sequence. Output = the learned
    * merge table (step, l, r, cnt).
    *
    * Scale posture: this is how production BPE trainers structure the
    * work — the corpus contributes exactly ONE keyed count shuffle
    * (word frequencies); all training state afterwards is
    * vocabulary-sized by construction, so each merge round is a tiny
    * keyed aggregate plus a single-row driver fetch (the merge
    * decision is metadata). Symbol sequences ride as
    * `[sym][sym]...` strings: the bracket framing makes the
    * merge a boundary-safe literal `replace` whose left-to-right
    * non-overlapping scan IS BPE's greedy application order — and
    * Spark's UTF8String.replace, DuckDB's replace, and
    * java.lang.String.replace all share that scan, which is what
    * makes the oracle exact. */
  /** Shared BPE training loop: returns the learned merge table and the
    * final per-WORD symbol-sequence table (word, freq, seq) — the
    * word-level encode cache q_llm_bpe_encode joins against. */
  private def trainBpe(spark: SparkSession, dir: String)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    import spark.implicits._
    // Corpus-scale stage: one shuffle. split(w, "") keeps a trailing
    // "" element (limit -1); array_remove drops it.
    var seqs = Tables.documents(spark, dir)
      .select(explode(split($"text", " ")).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("freq"))
      .select($"word", $"freq", concat(lit("["),
        concat_ws("][", array_remove(split($"word", ""), "")),
        lit("]")).as("seq"))
      .localCheckpoint(true) // vocab-sized
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= BPE_MERGES && !exhausted) {
      val pairs = seqs
        .select($"freq",
          split(regexp_replace($"seq", "^\\[|\\]$", ""), "\\]\\[")
            .as("syms"))
        .select($"freq", explode(zip_with(
          slice($"syms", lit(1), greatest(size($"syms") - 1, lit(0))),
          slice($"syms", lit(2), greatest(size($"syms") - 1, lit(0))),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy($"p.l".as("l"), $"p.r".as("r"))
        .agg(sum($"freq").as("cnt"))
      // Single-row fetch: the merge DECISION is metadata-scale.
      val top = pairs.orderBy($"cnt".desc, $"l".asc, $"r".asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step, l, r, c))
        // NO per-step checkpoint (r21): each merge adds ONE Project
        // (a literal replace) over the vocabulary-sized leaf, so the
        // lineage grows linearly — ten stacked replaces over a few
        // hundred rows re-execute in microseconds, while the old
        // per-step localCheckpoint paid a full materialization job per
        // merge (2 actions per step instead of 1; ~40% of warm train
        // time). This is NOT the fixpoint exponential-plan case: the
        // step references seqs once, so no doubling. The final table
        // is checkpointed below for the encode join.
        seqs = seqs.select($"word", $"freq",
          replace($"seq", lit(s"[$l][$r]"), lit(s"[$l$r]")).as("seq"))
        step += 1
      }
    }
    (merges.result(), seqs.localCheckpoint(true))
  }

  private def bpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    trainBpe(spark, dir)._1.toDF("step", "l", "r", "cnt").orderBy($"step")
  }

  /** q_llm_bpe_encode — the ENCODE half of the tokenizer: apply the
    * learned merge table back to the corpus and report per-doc BPE
    * token counts and chars-per-token compression. Every corpus word
    * is in the training vocabulary by construction, so encoding is a
    * broadcast join against the final word→symbol-sequence table —
    * precisely the word-level encode cache production tokenizers keep
    * (per-word greedy merge application memoized once, corpus pass is
    * a vocabulary-sized broadcast lookup, zero shuffle on the doc
    * side beyond the per-doc aggregate). */
  private def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vocab = trainBpe(spark, dir)._2
      .select($"word", length($"word").cast("long").as("wlen"),
        size(split(regexp_replace($"seq", "^\\[|\\]$", ""), "\\]\\["))
          .cast("long").as("n_sym"))
    Tables.documents(spark, dir)
      .select($"doc_id", explode(split($"text", " ")).as("word"))
      .join(broadcast(vocab), "word")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum($"n_sym").as("n_bpe"),
        round(sum($"wlen").cast("double") / sum($"n_sym"), 6)
          .as("chars_per_tok"))
      .orderBy($"doc_id")
  }

  /** Chained MATERIALIZED CTEs (plain CTE inlining re-expands the
    * whole prefix per round — exponential); one top-reference per
    * round via the cross join. Shared by the train and encode
    * oracles — `word` rides along so seq10 doubles as the encode
    * cache. */
  private val bpeChainSql: String = {
    val rounds = (1 to BPE_MERGES).map { i =>
      s"""pairs$i AS MATERIALIZED (SELECT syms[i] AS l, syms[i+1] AS r,
        CAST(sum(freq) AS BIGINT) AS cnt
      FROM (SELECT freq, syms,
              unnest(generate_series(1, len(syms) - 1)) AS i
            FROM (SELECT freq, string_split(trim(seq, '[]'), '][') AS syms
                  FROM seq${i - 1}))
      GROUP BY 1, 2),
    top$i AS MATERIALIZED (SELECT l, r, cnt FROM pairs$i
      ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
    seq$i AS MATERIALIZED (SELECT word, freq, replace(seq,
        '[' || l || '][' || r || ']', '[' || l || r || ']') AS seq
      FROM seq${i - 1}, top$i)"""
    }
    s"""WITH seq0 AS MATERIALIZED (
      SELECT word, CAST(count(*) AS BIGINT) AS freq,
        '[' || array_to_string(string_split(word, ''), '][') || ']' AS seq
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY word),
    ${rounds.mkString(",\n    ")}"""
  }

  private val bpeTrainSql: String = {
    val tops = (1 to BPE_MERGES)
      .map(i => s"SELECT $i AS step, l, r, cnt FROM top$i")
    s"""$bpeChainSql
    SELECT * FROM (${tops.mkString(" UNION ALL ")}) ORDER BY step"""
  }

  private val bpeEncodeSql: String = s"""$bpeChainSql,
    v AS (SELECT word, CAST(length(word) AS BIGINT) AS wlen,
            CAST(len(string_split(trim(seq, '[]'), '][')) AS BIGINT)
              AS n_sym
          FROM seq$BPE_MERGES),
    t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents)
    SELECT doc_id, count(*) AS n_words,
      CAST(sum(n_sym) AS BIGINT) AS n_bpe,
      round(CAST(sum(wlen) AS DOUBLE) / sum(n_sym), 6) AS chars_per_tok
    FROM t JOIN v USING (word)
    GROUP BY doc_id ORDER BY doc_id"""

  /** q_llm_fertility — tokenizer FERTILITY per language: BPE tokens
    * per word, by `documents.lang` — the standard multilingual-
    * tokenizer diagnostic (a tokenizer trained on one language
    * fragments the others into more pieces; fertility per language is
    * how that bias is measured and how per-language token budgets are
    * costed). Reuses the [[trainBpe]] merge table: every corpus word
    * is in the training vocabulary by construction, so scoring is the
    * same vocabulary-sized broadcast lookup as q_llm_bpe_encode, here
    * rolled up per LANGUAGE instead of per doc. Exactness: counts
    * BIGINT, fertility = Σtokens / Σwords one
    * [[streamline.batch.Aggregates.exactRound6]] (≥ 1 — the scaled
    * integer stays double-exact far past any real fertility). Scale:
    * one corpus shuffle inside training (word frequencies), one
    * map-side-combined (lang) rollup — the lang column rides the
    * same scan as the words, no extra join. */
  private def fertility(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vocab = trainBpe(spark, dir)._2
      .select($"word",
        size(split(regexp_replace($"seq", "^\\[|\\]$", ""), "\\]\\["))
          .cast("long").as("n_sym"))
    Tables.documents(spark, dir)
      .select($"lang", explode(split($"text", " ")).as("word"))
      .join(broadcast(vocab), "word")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_words"), sum($"n_sym").as("n_bpe"))
      .select($"lang", $"n_words", $"n_bpe",
        streamline.batch.Aggregates.exactRound6(
          $"n_bpe".cast("decimal(19,0)"),
          $"n_words".cast("decimal(19,0)")).as("fertility"))
      .orderBy($"lang")
  }

  private val fertilitySql: String = s"""$bpeChainSql,
    v AS (SELECT word,
            CAST(len(string_split(trim(seq, '[]'), '][')) AS BIGINT)
              AS n_sym
          FROM seq$BPE_MERGES),
    t AS (SELECT lang, unnest(string_split(text, ' ')) AS word
          FROM documents),
    a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
            CAST(sum(n_sym) AS BIGINT) AS n_bpe
          FROM t JOIN v USING (word) GROUP BY 1)
    SELECT lang, n_words, n_bpe,
      ${streamline.batch.Aggregates.exactRound6Sql("n_bpe", "n_words")}
        AS fertility
    FROM a ORDER BY lang"""

  private def bpePairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(explode(split($"text", " ")).as("w"))
      .where(length($"w") >= 2)
      .select(explode(transform(
        sequence(lit(1), length($"w") - 1),
        i => $"w".substr(i, lit(2)))).as("pair"))
      .groupBy($"pair").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"pair")
      .limit(20)
  }

  private val bpePairsSql = """
    WITH w AS (SELECT unnest(string_split(text, ' ')) AS w
               FROM documents),
    p AS (SELECT substring(w, i, 2) AS pair
          FROM w, LATERAL (SELECT unnest(generate_series(1, len(w)-1))
                           AS i) g
          WHERE len(w) >= 2)
    SELECT pair, count(*) AS cnt FROM p
    GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20"""

  /** q_llm_inverted_index — posting-list construction, the retrieval
    * side of a corpus pipeline (BM25/contamination lookup both start
    * here): token → (document frequency, capped sorted posting list).
    * One explode + one keyed aggregation; the posting list is
    * `slice(sort_array(collect_set))` — bounded at 8 doc ids per term,
    * so the output row is fixed-width no matter how common the term
    * (the full list for a stopword at 100 TB would be the corpus
    * itself; a capped list + the exact df count is the scalable
    * contract). Serialized to CSV per SURVEY §2.12's no-array rule.
    * Terms below df 3 are dropped — the long tail is noise for
    * retrieval and would dominate the output row count. */
  private def invertedIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", explode(split(lower($"text"), "[^a-z]+")).as("term"))
      .where($"term" =!= "")
      .groupBy($"term")
      .agg(countDistinct($"doc_id").as("df"),
        array_join(slice(sort_array(collect_set($"doc_id")), 1, 8), ",")
          .as("postings"))
      .where($"df" >= 3)
      .orderBy($"term")
  }

  private val invertedIndexSql = """
    WITH toks AS (SELECT doc_id,
                    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
                  FROM documents),
    pl AS (SELECT term, count(DISTINCT doc_id) AS df,
             array_to_string(list_sort(list(DISTINCT doc_id))[1:8], ',')
               AS postings
           FROM toks GROUP BY term)
    SELECT term, df, postings FROM pl WHERE df >= 3 ORDER BY term"""

  /** q_llm_entropy — token-entropy quality signal: Shannon entropy of
    * each document's token distribution (low entropy = repetitive /
    * template text, a standard corpus-quality gate next to the Gopher
    * rules). Determinism is the whole design: H = log2(n) − (Σ c·log2 c)/n
    * needs an order-dependent double sum, so instead of folding over
    * tokens (whose sort order would drag string collation into the
    * hash), the counts are HISTOGRAMMED — per doc and count-value k,
    * m_k = number of distinct tokens occurring exactly k times — and
    * the fold runs over ascending INTEGER k with term m_k·k·log2(k).
    * Tokens with k=1 contribute exactly 0.0, so the fold touches only
    * the few repeated-count classes; the k-order is engine-neutral and
    * the IEEE tree is mirrored in the oracle. Two keyed shuffles
    * ((doc,tok) then doc), both map-side combined; at 100 TB this is
    * the same shape as the tf pass of tf-idf. */
  private def entropy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = Tables.documents(spark, dir)
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("c"))
    val hist = counts
      .groupBy($"doc_id", $"c").agg(count(lit(1)).as("m"))
      .select($"doc_id", $"c", $"m",
        ($"m".cast("double") * $"c".cast("double")
          * log2($"c".cast("double"))).as("term"))
    hist.groupBy($"doc_id")
      .agg(sum($"c" * $"m").as("n_tok"),
        sum($"m").as("n_distinct"),
        aggregate(
          transform(array_sort(collect_list(struct($"c", $"term"))),
            x => x.getField("term")),
          lit(0.0d), (acc, x) => acc + x).as("clogc"))
      .select($"doc_id", $"n_tok", $"n_distinct",
        round(log2($"n_tok".cast("double"))
          - $"clogc" / $"n_tok".cast("double"), 6).as("entropy"))
      .orderBy($"doc_id")
  }

  private val entropySql = """
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
               FROM documents),
    c AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY doc_id, tok),
    h AS (SELECT doc_id, c, count(*) AS m,
            CAST(count(*) AS DOUBLE) * CAST(c AS DOUBLE)
              * log2(CAST(c AS DOUBLE)) AS term
          FROM c GROUP BY doc_id, c),
    a AS (SELECT doc_id, CAST(sum(c * m) AS BIGINT) AS n_tok,
            CAST(sum(m) AS BIGINT) AS n_distinct,
            list_reduce(
              list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY c)),
              (acc, x) -> acc + x) AS clogc
          FROM h GROUP BY doc_id)
    SELECT doc_id, n_tok, n_distinct,
      round(log2(CAST(n_tok AS DOUBLE)) - clogc / CAST(n_tok AS DOUBLE), 6)
        AS entropy
    FROM a ORDER BY doc_id"""

  /** q_llm_template_prefix — boilerplate-template detection by shared
    * document OPENINGS: documents that start with the same 3-word
    * prefix across the corpus are template instances (the crawl-
    * pipeline screen for SEO stubs, license headers, and generated
    * pages — CCNet-style boilerplate operates per-line; this fixture's
    * documents are single-line, so the opening n-gram IS the template
    * key). Emits each prefix shared by ≥ 2 documents with its doc
    * count and how many distinct sources it spans (a multi-source
    * template is crawler boilerplate; a single-source one is a site
    * template). Pure integer/string ops — no float anywhere; total
    * order on (n_docs DESC, prefix) since prefixes are unique keys.
    * Scale: one map-side projection to the 3-word prefix + one
    * map-side-combined (prefix) count with a distinct-source count —
    * a single corpus shuffle on a short-string key; the output is
    * template-dictionary-sized. */
  private def templatePrefix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"source",
        concat_ws(" ", slice(split($"text", " "), 1, 3)).as("prefix"))
      .groupBy($"prefix")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"source").as("n_sources"))
      .where($"n_docs" >= 2)
      .orderBy($"n_docs".desc, $"prefix".asc)
  }

  private val templatePrefixSql = """
    WITH p AS (SELECT source,
        array_to_string((string_split(text, ' '))[1:3], ' ') AS prefix
      FROM documents),
    g AS (SELECT prefix, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(count(DISTINCT source) AS BIGINT) AS n_sources
          FROM p GROUP BY 1)
    SELECT prefix, n_docs, n_sources FROM g
    WHERE n_docs >= 2 ORDER BY n_docs DESC, prefix"""

  /** q_llm_ngram_entropy_rate — conditional bigram entropy per
    * language: H(w₂|w₁) = Σ c(w₁w₂)·(ln c(w₁·) − ln c(w₁w₂)) / N —
    * the ENTROPY RATE of the corpus under a bigram model, the
    * predictability/repetitiveness signal a data pipeline tracks per
    * slice (templated or machine-generated text scores LOW; it
    * complements q_llm_entropy's per-doc unigram entropy and
    * q_llm_bigram_lm's probability table with a corpus-level rate).
    * Exactness: the transcendental factors through the
    * DISTINCT-INTEGER side table (ln once per distinct bigram /
    * context count, rounded THERE to L₄ — the entropy/psi/theil
    * discipline), the numerator exact BIGINT, the rate ONE
    * [[streamline.batch.Aggregates.exactRound6]] over (num₄, N·10⁴).
    * Scale: one explode → map-side-combined (lang, w₁, w₂) count
    * (checkpointed — contexts, totals, side-table values and the
    * term join all read it); everything after runs on the bigram-
    * VOCABULARY table with a keyed (lang, w₁) context join and
    * value-distinct broadcasts — the corpus is scanned once. */
  private def ngramEntropyRate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cb = Tables.documents(spark, dir)
      .select($"lang", split($"text", " ").as("ws"))
      .where(size($"ws") >= 2)
      .select($"lang", explode(expr(
        "transform(sequence(1, size(ws) - 1)," +
          " i -> struct(element_at(ws, i) AS w1," +
          " element_at(ws, i + 1) AS w2))")).as("p"))
      .groupBy($"lang", $"p.w1".as("w1"), $"p.w2".as("w2"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // contexts/totals/values/terms read it
    val cu = cb.groupBy($"lang", $"w1").agg(sum($"c").as("cw"))
    val n = cb.groupBy($"lang").agg(sum($"c").as("n"))
    val l = cb.select($"c".as("v")).union(cu.select($"cw".as("v")))
      .distinct()
      .select($"v", round(log($"v") * 10000).cast("long").as("l4"))
      .localCheckpoint(true) // two broadcast branches read it
    val num = cb.join(cu.hint("shuffle_hash"), Seq("lang", "w1"))
      .join(broadcast(l.select($"v".as("vc"), $"l4".as("lc"))),
        $"vc" === $"c")
      .join(broadcast(l.select($"v".as("vcw"), $"l4".as("lcw"))),
        $"vcw" === $"cw")
      .groupBy($"lang")
      .agg(sum($"c" * ($"lcw" - $"lc")).as("num4"))
    n.join(num, "lang")
      .select($"lang", $"n".as("n_bigrams"), $"num4",
        streamline.batch.Aggregates.exactRound6($"num4",
          $"n".cast("decimal(19,0)") * lit(10000L)).as("cond_entropy"))
      .orderBy($"lang")
  }

  private val ngramEntropyRateSql = """
    WITH w AS (SELECT lang, string_split(text, ' ') AS ws
               FROM documents),
    bg AS (SELECT lang, ws[i] AS w1, ws[i+1] AS w2
           FROM w, unnest(range(1, len(ws))) AS t(i)
           WHERE len(ws) >= 2),
    cb AS (SELECT lang, w1, w2, CAST(count(*) AS BIGINT) AS c
           FROM bg GROUP BY 1, 2, 3),
    cu AS (SELECT lang, w1, CAST(sum(c) AS BIGINT) AS cw
           FROM cb GROUP BY 1, 2),
    n AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM cb GROUP BY 1),
    vals AS (SELECT DISTINCT c AS v FROM cb
             UNION SELECT DISTINCT cw FROM cu),
    l AS (SELECT v, CAST(round(ln(v) * 10000) AS BIGINT) AS l4
          FROM vals),
    num AS (SELECT cb.lang,
        CAST(sum(cb.c * (lcw.l4 - lc.l4)) AS BIGINT) AS num4
      FROM cb JOIN cu ON cu.lang = cb.lang AND cu.w1 = cb.w1
        JOIN l lc ON lc.v = cb.c JOIN l lcw ON lcw.v = cu.cw
      GROUP BY 1)
    SELECT n.lang, n.n AS n_bigrams, num.num4,
      """ + streamline.batch.Aggregates.exactRound6Sql("num.num4",
        "n.n::HUGEINT * 10000") + """ AS cond_entropy
    FROM n JOIN num USING (lang) ORDER BY lang"""

  /** q_llm_backoff_lm — held-out stupid-backoff bigram scoring
    * (Brants et al. 2007): a bigram model built from the EVEN doc_ids
    * scores the ODD docs' bigrams, per language. Unlike
    * q_llm_bigram_lm (in-corpus: every bigram is seen by
    * construction), the held-out split exercises the BACKOFF path —
    * score = c₁₂/c₁· if the bigram is in the model, else λ·c(w₂)/N
    * (unigram backoff, λ = 0.4), else λ²/N — the quality-vs-novelty
    * signal a pipeline tracks per slice, and the smoke test of any
    * n-gram LM build. Exactness: log-scores through the
    * DISTINCT-INTEGER ln side table (entropy/psi discipline), λ as
    * the PINNED integer constant L₄(0.4) = −9163 on both engines
    * (never computed — an engine's own ln(0.4) could round the
    * boundary differently), the per-language total exact BIGINT, the
    * mean ONE [[streamline.batch.Aggregates.exactRound6]]. Scale:
    * model tables are vocabulary-sized and BROADCAST over the test
    * stream (the bigram_lm posture — the scoring pass never
    * shuffles); one map-side-combined shuffle each builds c₁₂ and
    * the unigram table. */
  private def backoffLm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val L_LAMBDA = -9163L // round(ln(0.4)·1e4), pinned on both engines
    val w = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", split($"text", " ").as("ws"))
      .localCheckpoint(true) // train bigrams/unigrams + test read it
    def bigrams(df: DataFrame) = df.where(size($"ws") >= 2)
      .select($"lang", explode(expr(
        "transform(sequence(1, size(ws) - 1)," +
          " i -> struct(element_at(ws, i) AS w1," +
          " element_at(ws, i + 1) AS w2))")).as("p"))
      .select($"lang", $"p.w1".as("w1"), $"p.w2".as("w2"))
    val c12 = bigrams(w.where($"doc_id" % 2 === 0))
      .groupBy($"lang", $"w1", $"w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint(true) // contexts + the probe + values read it
    val c1 = c12.groupBy($"lang", $"w1").agg(sum($"c12").as("c1"))
    val cu = w.where($"doc_id" % 2 === 0)
      .select($"lang", explode($"ws").as("wd"))
      .groupBy($"lang", $"wd").agg(count(lit(1)).as("cu"))
      .localCheckpoint(true) // totals + the probe + values read it
    val nn = cu.groupBy($"lang").agg(sum($"cu").as("n"))
    val l = c12.select($"c12".as("v")).union(c1.select($"c1".as("v")))
      .union(cu.select($"cu".as("v"))).union(nn.select($"n".as("v")))
      .distinct()
      .select($"v", round(log($"v") * 10000).cast("long").as("l4"))
      .localCheckpoint(true) // four broadcast branches read it
    def l4of(vCol: String, as: String) =
      broadcast(l.select($"v".as(vCol), $"l4".as(as)))
    val te = bigrams(w.where($"doc_id" % 2 === 1))
    val sc = te
      .join(broadcast(c12), Seq("lang", "w1", "w2"), "left")
      .join(broadcast(c1), Seq("lang", "w1"), "left")
      .join(broadcast(cu.select($"lang", $"wd".as("w2"), $"cu")),
        Seq("lang", "w2"), "left")
      .join(broadcast(nn), "lang")
      .join(l4of("vb", "lb"), $"vb" === $"c12", "left")
      .join(l4of("vc1", "lc1"), $"vc1" === $"c1", "left")
      .join(l4of("vu", "lu"), $"vu" === $"cu", "left")
      .join(l4of("vn", "ln2"), $"vn" === $"n")
      .select($"lang",
        when($"c12".isNotNull, lit("seen"))
          .when($"cu".isNotNull, lit("backoff"))
          .otherwise(lit("oov")).as("cls"),
        when($"c12".isNotNull, $"lb" - $"lc1")
          .when($"cu".isNotNull, lit(L_LAMBDA) + $"lu" - $"ln2")
          .otherwise(lit(2 * L_LAMBDA) - $"ln2").as("s4"))
    sc.groupBy($"lang")
      .agg(count(lit(1)).as("n_test"),
        count(when($"cls" === "seen", 1)).as("n_seen"),
        count(when($"cls" === "backoff", 1)).as("n_backoff"),
        count(when($"cls" === "oov", 1)).as("n_oov"),
        sum($"s4").as("score4"))
      .select($"lang", $"n_test", $"n_seen", $"n_backoff", $"n_oov",
        $"score4",
        streamline.batch.Aggregates.exactRound6($"score4",
          $"n_test".cast("decimal(19,0)") * lit(10000L))
          .as("avg_logscore"))
      .orderBy($"lang")
  }

  private val backoffLmSql = """
    WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS ws
               FROM documents),
    trbg AS (SELECT lang, ws[i] AS w1, ws[i+1] AS w2
             FROM w, unnest(range(1, len(ws))) AS t(i)
             WHERE doc_id % 2 = 0 AND len(ws) >= 2),
    c12 AS (SELECT lang, w1, w2, CAST(count(*) AS BIGINT) AS c12
            FROM trbg GROUP BY 1, 2, 3),
    c1 AS (SELECT lang, w1, CAST(sum(c12) AS BIGINT) AS c1
           FROM c12 GROUP BY 1, 2),
    tru AS (SELECT lang, ws[i] AS wd
            FROM w, unnest(range(1, len(ws) + 1)) AS t(i)
            WHERE doc_id % 2 = 0),
    cu AS (SELECT lang, wd, CAST(count(*) AS BIGINT) AS cu
           FROM tru GROUP BY 1, 2),
    nn AS (SELECT lang, CAST(sum(cu) AS BIGINT) AS n FROM cu GROUP BY 1),
    tebg AS (SELECT lang, ws[i] AS w1, ws[i+1] AS w2
             FROM w, unnest(range(1, len(ws))) AS t(i)
             WHERE doc_id % 2 = 1 AND len(ws) >= 2),
    vals AS (SELECT DISTINCT c12 AS v FROM c12
             UNION SELECT DISTINCT c1 FROM c1
             UNION SELECT DISTINCT cu FROM cu
             UNION SELECT DISTINCT n FROM nn),
    l AS (SELECT v, CAST(round(ln(v) * 10000) AS BIGINT) AS l4
          FROM vals),
    sc AS (SELECT t.lang,
        CASE WHEN b.c12 IS NOT NULL THEN 'seen'
             WHEN u.cu IS NOT NULL THEN 'backoff'
             ELSE 'oov' END AS cls,
        CASE WHEN b.c12 IS NOT NULL THEN lb.l4 - lc1.l4
             WHEN u.cu IS NOT NULL THEN -9163 + lu.l4 - ln2.l4
             ELSE -18326 - ln2.l4 END AS s4
      FROM tebg t
      LEFT JOIN c12 b ON b.lang = t.lang AND b.w1 = t.w1
        AND b.w2 = t.w2
      LEFT JOIN c1 ON c1.lang = t.lang AND c1.w1 = t.w1
      LEFT JOIN cu u ON u.lang = t.lang AND u.wd = t.w2
      JOIN nn ON nn.lang = t.lang
      LEFT JOIN l lb ON lb.v = b.c12
      LEFT JOIN l lc1 ON lc1.v = c1.c1
      LEFT JOIN l lu ON lu.v = u.cu
      JOIN l ln2 ON ln2.v = nn.n)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_test,
      CAST(count(*) FILTER (WHERE cls = 'seen') AS BIGINT) AS n_seen,
      CAST(count(*) FILTER (WHERE cls = 'backoff') AS BIGINT)
        AS n_backoff,
      CAST(count(*) FILTER (WHERE cls = 'oov') AS BIGINT) AS n_oov,
      CAST(sum(s4) AS BIGINT) AS score4,
      """ + streamline.batch.Aggregates.exactRound6Sql(
        "CAST(sum(s4) AS BIGINT)",
        "CAST(count(*) AS BIGINT) * 10000") + """ AS avg_logscore
    FROM sc GROUP BY 1 ORDER BY 1"""

  /** q_llm_boilerplate — CCNet/RefinedWeb-style line-frequency
    * boilerplate removal: hash-count every LINE of every page across
    * the corpus, then drop the lines that appear in more than a
    * handful of distinct documents (nav bars, footers, cookie banners
    * — the repeated chrome a crawl carries on every page of a site).
    * The corpus text is flat words, so the page structure is
    * synthesized deterministically the dedup_url way: every doc gets a
    * per-source nav line, its words are folded into 8-word content
    * lines, and every third doc gets a per-source footer line. The
    * remover must find the boilerplate through the REAL frequency
    * pass — per-line distinct-doc counts — while the oracle rebuilds
    * the same synthesis independently, so a counting bug cannot cancel
    * out. (Short trailing content lines from the small vocabulary also
    * recur across docs and get dropped — the threshold catches real
    * repeated text, not just the planted chrome; both branches are
    * spec-asserted.) Scale posture: explode → ONE map-side-combined
    * distinct-doc count per line → ONE shuffled join back on the line
    * key (corpus-linear, the dedup_weight posture — the line-frequency
    * table is corpus-sized, never broadcast); the line table is
    * checkpointed so the frequency branch and the join don't re-explode
    * the corpus. At 100 TB the count is per-shard with an absolute
    * threshold, exactly CCNet's published recipe. */
  /** Per-doc line-pass stats — (doc_id, n_lines, n_kept, kept_words,
    * tot_words) — factored out so q_llm_boilerplate and
    * q_llm_hygiene_pipeline share the ONE corpus-linear frequency pass
    * (same plan, no drift between the standalone screen and the
    * composed pipeline). */
  private def boilerplateDoc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lines = Tables.documents(spark, dir)
      .select($"doc_id", $"source", words($"text").as("ws"))
      .select($"doc_id", explode(concat(
        array(concat(lit("nav "), $"source", lit(" home about contact"))),
        // guarded: sequence(0, -1) would step DOWN to [0, -1] if ws
        // were ever empty (today split("", " ") = [""] so size >= 1,
        // but a future words() that filters empties must degrade to
        // zero content lines, matching the oracle's empty range)
        when(size($"ws") > 0, transform(
          sequence(lit(0), ceil(size($"ws") / lit(8.0)).cast("int") - 1),
          i => array_join(slice($"ws", i * lit(8) + 1, lit(8)), " ")))
          .otherwise(array().cast("array<string>")),
        when($"doc_id" % 3 === 0, array(concat(
            lit("copyright "), $"source", lit(" all rights reserved"))))
          .otherwise(array().cast("array<string>")))).as("line"))
      .localCheckpoint(true) // frequency branch + join both read it
    val lineDf = lines.groupBy($"line")
      .agg(countDistinct($"doc_id").as("df"))
    val lw = size(words($"line")).cast("long")
    lines.join(lineDf.hint("shuffle_hash"), "line")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_lines"),
        sum(when($"df" <= 4, 1L).otherwise(0L)).as("n_kept"),
        sum(when($"df" <= 4, lw).otherwise(0L)).as("kept_words"),
        sum(lw).as("tot_words"))
  }

  private def boilerplate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    boilerplateDoc(spark, dir)
      .select($"doc_id", $"n_lines", $"n_kept", $"kept_words",
        streamline.batch.Aggregates.exactRound6(
          $"tot_words" - $"kept_words", $"tot_words").as("boiler_frac"))
      .orderBy($"doc_id")
  }

  private val boilerplateSql = """
    WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS ws
               FROM documents),
    lines AS (
      SELECT doc_id, 'nav ' || source || ' home about contact' AS line
      FROM d
      UNION ALL
      SELECT doc_id, array_to_string(ws[8*i+1 : 8*i+8], ' ') AS line
      FROM d, unnest(range(0, CAST(ceil(len(ws) / 8.0) AS BIGINT))) AS t(i)
      UNION ALL
      SELECT doc_id, 'copyright ' || source || ' all rights reserved'
      FROM d WHERE doc_id % 3 = 0),
    df AS (SELECT line, count(DISTINCT doc_id) AS df FROM lines GROUP BY 1),
    j AS (SELECT l.doc_id, df.df,
            CAST(len(string_split(l.line, ' ')) AS BIGINT) AS lw
          FROM lines l JOIN df USING (line)),
    agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
              CAST(coalesce(sum(CASE WHEN df <= 4 THEN 1 END), 0)
                AS BIGINT) AS n_kept,
              CAST(coalesce(sum(CASE WHEN df <= 4 THEN lw END), 0)
                AS BIGINT) AS kept_words,
              CAST(sum(lw) AS BIGINT) AS tot_words
            FROM j GROUP BY 1)
    SELECT doc_id, n_lines, n_kept, kept_words,
      """ + streamline.batch.Aggregates.exactRound6Sql(
        "tot_words - kept_words", "tot_words") + """ AS boiler_frac
    FROM agg ORDER BY doc_id"""

  /** q_llm_encoding — encoding-hygiene screen, the byte-level pass a
    * crawl pipeline runs before any tokenization: count C0 control
    * characters (excluding tab/newline/CR), U+FFFD replacement
    * characters (the scar a broken charset transcode leaves), and
    * NBSPs, then report the length after scrubbing (controls and
    * replacement chars dropped, NBSP normalized to a plain space) and
    * a clean/dirty verdict. Artifacts are planted deterministically by
    * doc_id residue (the dedup_url discipline — the fixture text is
    * clean ASCII): %4==1 gets a BEL prefix, %4==2 two trailing U+FFFDs,
    * %4==3 an NBSP prefix, %4==0 stays clean, so all verdict branches
    * occur. The screen must find them through REAL regex scans over
    * the raw string while the oracle derives every count from the
    * planting rule alone — a regex bug cannot cancel out. Pure per-row
    * codegen projection; nothing shuffles. */
  // planting expressions + regexes shared by the standalone screens
  // (q_llm_encoding / q_llm_pii) and the composed q_llm_hygiene_pipeline
  // -- factored so the pipeline runs the IDENTICAL detectors, not a copy
  private val ctrlRe = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"
  private def encodingRaw: Column =
    when(col("doc_id") % 4 === 1, concat(lit("\u0007"), col("text")))
      .when(col("doc_id") % 4 === 2, concat(col("text"), lit("\uFFFD\uFFFD")))
      .when(col("doc_id") % 4 === 3, concat(lit("\u00A0"), col("text")))
      .otherwise(col("text"))

  private def encoding(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", encodingRaw.as("raw"))
      .select($"doc_id",
        size(regexp_extract_all($"raw", lit(ctrlRe), lit(0)))
          .cast("long").as("n_ctrl"),
        size(regexp_extract_all($"raw", lit("\uFFFD"), lit(0)))
          .cast("long").as("n_repl"),
        size(regexp_extract_all($"raw", lit("\u00A0"), lit(0)))
          .cast("long").as("n_nbsp"),
        length(regexp_replace(regexp_replace(regexp_replace($"raw",
            ctrlRe, ""), "\uFFFD", ""), "\u00A0", " "))
          .cast("long").as("clean_len"))
      .withColumn("verdict",
        when($"n_ctrl" + $"n_repl" + $"n_nbsp" === 0, lit("clean"))
          .otherwise(lit("dirty")))
      .orderBy($"doc_id")
  }

  // Oracle derived from the planting rule, not from parsing (the
  // dedup_url trick): counts by residue, clean length from the clean
  // fixture text (+1 for the NBSP→space normalization, which KEEPS a
  // character).
  private val encodingSql = """
    SELECT doc_id,
      CAST(CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 0 END AS BIGINT) AS n_ctrl,
      CAST(CASE WHEN doc_id % 4 = 2 THEN 2 ELSE 0 END AS BIGINT) AS n_repl,
      CAST(CASE WHEN doc_id % 4 = 3 THEN 1 ELSE 0 END AS BIGINT) AS n_nbsp,
      CAST(length(text) + CASE WHEN doc_id % 4 = 3 THEN 1 ELSE 0 END
        AS BIGINT) AS clean_len,
      CASE WHEN doc_id % 4 = 0 THEN 'clean' ELSE 'dirty' END AS verdict
    FROM documents ORDER BY doc_id"""

  /** q_llm_pii — structural PII detection + masking (the Dolma-style
    * anonymization pass, beyond q_llm_redact's word denylist): find
    * emails, NANP phone numbers and IPv4 addresses by REAL regex scans
    * and replace each with a typed placeholder. PII is planted
    * deterministically by doc_id residue on the digit-free fixture
    * text (%5==1 a doc-id-derived email, ==2 a doc-id-derived phone,
    * ==3 a doc-id-derived IP, ==4 email AND IP, ==0 clean — all
    * branches occur and the planted strings VARY per doc, so a
    * memorized constant can't pass). The oracle derives counts and the
    * masked string from the planting rule alone and never runs a
    * regex, so a pattern bug cannot cancel out. Pure per-row codegen
    * projection; nothing shuffles — the 100 TB shape is a map-only
    * pass fused into the scan. */
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  private val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private def piiRaw: Column = concat(col("text"),
    when(col("doc_id") % 5 === 1, concat(lit(" contact user"),
      col("doc_id").cast("string"), lit("@example.com")))
      .when(col("doc_id") % 5 === 2, concat(lit(" call 415-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      .when(col("doc_id") % 5 === 3, concat(lit(" host 10.0."),
        (col("doc_id") % 256).cast("string"), lit("."),
        ((col("doc_id") * 7) % 256).cast("string")))
      .when(col("doc_id") % 5 === 4, concat(lit(" mail ops"),
        col("doc_id").cast("string"), lit("@example.net from 172.16."),
        ((col("doc_id") * 3) % 256).cast("string"), lit("."),
        ((col("doc_id") * 11) % 256).cast("string")))
      .otherwise(lit("")))

  private def pii(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", piiRaw.as("raw"))
      .select($"doc_id",
        size(regexp_extract_all($"raw", lit(emailRe), lit(0)))
          .cast("long").as("n_email"),
        size(regexp_extract_all($"raw", lit(phoneRe), lit(0)))
          .cast("long").as("n_phone"),
        size(regexp_extract_all($"raw", lit(ipRe), lit(0)))
          .cast("long").as("n_ip"),
        regexp_replace(regexp_replace(regexp_replace($"raw",
          emailRe, "[EMAIL]"), ipRe, "[IP]"), phoneRe, "[PHONE]")
          .as("masked"))
      .orderBy($"doc_id")
  }

  private val piiSql = """
    SELECT doc_id,
      CAST(CASE WHEN doc_id % 5 IN (1, 4) THEN 1 ELSE 0 END AS BIGINT)
        AS n_email,
      CAST(CASE WHEN doc_id % 5 = 2 THEN 1 ELSE 0 END AS BIGINT)
        AS n_phone,
      CAST(CASE WHEN doc_id % 5 IN (3, 4) THEN 1 ELSE 0 END AS BIGINT)
        AS n_ip,
      text || CASE doc_id % 5
        WHEN 1 THEN ' contact [EMAIL]'
        WHEN 2 THEN ' call [PHONE]'
        WHEN 3 THEN ' host [IP]'
        WHEN 4 THEN ' mail [EMAIL] from [IP]'
        ELSE '' END AS masked
    FROM documents ORDER BY doc_id"""

  /** q_llm_hygiene_pipeline — the r19 hygiene trio COMPOSED the way a
    * real crawl pipeline runs it (r19 judge item 6): one declared pass,
    * boilerplate → encoding → PII in sequence, with per-stage attrition
    * accounting (docs in/out, words in/out, items flagged) so the
    * end-to-end funnel is oracle-checked, not just each screen alone.
    * Stage rules are EXACTLY the standalone screens' (shared planting
    * expressions and regexes — [[encodingRaw]]/[[piiRaw]]/[[ctrlRe]] —
    * and the shared [[boilerplateDoc]] line pass, so the composition
    * cannot drift from the parts):
    *  1. boilerplate — drop lines seen in >4 distinct docs; a doc
    *     survives if any line is kept; flagged = lines dropped;
    *  2. encoding — drop docs with FATAL byte damage (C0 controls or
    *     U+FFFD; an NBSP is normalizable, not fatal); flagged = docs
    *     dropped; word accounting carries the stage-1 kept words;
    *  3. pii — mask, never drop: doc and word counts pass through,
    *     flagged = email+phone+IP hits found by the REAL regex scans
    *     over the surviving docs.
    * Plan shape: the line-frequency pass is the only corpus shuffle
    * (the q_llm_boilerplate plan, line table never broadcast); both
    * screens are codegen'd map projections fused into their scan; the
    * per-doc frames meet in ONE doc_id-keyed shuffle-hash join; the
    * three stage summaries are single-row aggregates. At 100 TB this
    * runs as one corpus-linear pass — the three standalone screens
    * would scan the corpus three times. */
  private def hygienePipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val screens = Tables.documents(spark, dir).select($"doc_id",
      (size(regexp_extract_all(encodingRaw, lit(ctrlRe), lit(0))) +
        size(regexp_extract_all(encodingRaw, lit("\\uFFFD"), lit(0))) > 0)
        .as("enc_fatal"),
      (size(regexp_extract_all(piiRaw, lit(emailRe), lit(0))) +
        size(regexp_extract_all(piiRaw, lit(phoneRe), lit(0))) +
        size(regexp_extract_all(piiRaw, lit(ipRe), lit(0))))
        .cast("long").as("pii_hits"))
    // one row per doc; three stage aggregates read it
    val doc = boilerplateDoc(spark, dir)
      .join(screens.hint("shuffle_hash"), "doc_id")
      .localCheckpoint(true)
    def stage(idx: Int, name: String, df: DataFrame, docsOut: Column,
              wordsIn: Column, wordsOut: Column, flagged: Column) =
      df.agg(count(lit(1)).as("docs_in"), docsOut.as("docs_out"),
          wordsIn.as("words_in"), wordsOut.as("words_out"),
          flagged.as("n_flagged"))
        .select(lit(idx).as("stage_idx"), lit(name).as("stage"),
          $"docs_in", $"docs_out", $"words_in", $"words_out", $"n_flagged")
    val s1 = stage(1, "boilerplate", doc,
      sum(when($"n_kept" > 0, 1L).otherwise(0L)),
      sum($"tot_words"),
      sum(when($"n_kept" > 0, $"kept_words").otherwise(0L)),
      sum($"n_lines" - $"n_kept"))
    val surv1 = doc.where($"n_kept" > 0)
    val s2 = stage(2, "encoding", surv1,
      sum(when(!$"enc_fatal", 1L).otherwise(0L)),
      sum($"kept_words"),
      sum(when(!$"enc_fatal", $"kept_words").otherwise(0L)),
      sum(when($"enc_fatal", 1L).otherwise(0L)))
    val surv2 = surv1.where(!$"enc_fatal")
    val s3 = stage(3, "pii", surv2,
      count(lit(1)), sum($"kept_words"), sum($"kept_words"),
      sum($"pii_hits"))
    s1.unionByName(s2).unionByName(s3).orderBy($"stage_idx")
  }

  // Oracle: the boilerplate synthesis CTE (independent recount of the
  // line pass) + the planting rules for the screens (enc_fatal and
  // pii_hits derived from doc_id residue alone, never from a regex —
  // the dedup_url discipline: a detector bug cannot cancel out).
  private val hygienePipelineSql = """
    WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS ws
               FROM documents),
    lines AS (
      SELECT doc_id, 'nav ' || source || ' home about contact' AS line
      FROM d
      UNION ALL
      SELECT doc_id, array_to_string(ws[8*i+1 : 8*i+8], ' ') AS line
      FROM d, unnest(range(0, CAST(ceil(len(ws) / 8.0) AS BIGINT))) AS t(i)
      UNION ALL
      SELECT doc_id, 'copyright ' || source || ' all rights reserved'
      FROM d WHERE doc_id % 3 = 0),
    df AS (SELECT line, count(DISTINCT doc_id) AS df FROM lines GROUP BY 1),
    j AS (SELECT l.doc_id, df.df,
            CAST(len(string_split(l.line, ' ')) AS BIGINT) AS lw
          FROM lines l JOIN df USING (line)),
    doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
              CAST(coalesce(sum(CASE WHEN df <= 4 THEN 1 END), 0)
                AS BIGINT) AS n_kept,
              CAST(coalesce(sum(CASE WHEN df <= 4 THEN lw END), 0)
                AS BIGINT) AS kept_words,
              CAST(sum(lw) AS BIGINT) AS tot_words,
              (doc_id % 4) IN (1, 2) AS enc_fatal,
              CAST(CASE doc_id % 5 WHEN 4 THEN 2 WHEN 0 THEN 0 ELSE 1 END
                AS BIGINT) AS pii_hits
            FROM j GROUP BY doc_id),
    s1 AS (SELECT CAST(1 AS INTEGER) AS stage_idx, 'boilerplate' AS stage,
             CAST(count(*) AS BIGINT) AS docs_in,
             CAST(sum(CASE WHEN n_kept > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_out,
             CAST(sum(tot_words) AS BIGINT) AS words_in,
             CAST(sum(CASE WHEN n_kept > 0 THEN kept_words ELSE 0 END)
               AS BIGINT) AS words_out,
             CAST(sum(n_lines - n_kept) AS BIGINT) AS n_flagged
           FROM doc),
    s2 AS (SELECT CAST(2 AS INTEGER) AS stage_idx, 'encoding' AS stage,
             CAST(count(*) AS BIGINT) AS docs_in,
             CAST(sum(CASE WHEN NOT enc_fatal THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_out,
             CAST(sum(kept_words) AS BIGINT) AS words_in,
             CAST(sum(CASE WHEN NOT enc_fatal THEN kept_words ELSE 0 END)
               AS BIGINT) AS words_out,
             CAST(sum(CASE WHEN enc_fatal THEN 1 ELSE 0 END) AS BIGINT)
               AS n_flagged
           FROM doc WHERE n_kept > 0),
    s3 AS (SELECT CAST(3 AS INTEGER) AS stage_idx, 'pii' AS stage,
             CAST(count(*) AS BIGINT) AS docs_in,
             CAST(count(*) AS BIGINT) AS docs_out,
             CAST(sum(kept_words) AS BIGINT) AS words_in,
             CAST(sum(kept_words) AS BIGINT) AS words_out,
             CAST(sum(pii_hits) AS BIGINT) AS n_flagged
           FROM doc WHERE n_kept > 0 AND NOT enc_fatal)
    SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3
    ORDER BY stage_idx"""

  val all: Seq[Q] = Seq(
    Q("q_llm_hygiene_pipeline", hygienePipeline _, hygienePipelineSql),
    Q("q_llm_pii", pii _, piiSql),
    Q("q_llm_boilerplate", boilerplate _, boilerplateSql),
    Q("q_llm_encoding", encoding _, encodingSql),
    Q("q_llm_burstiness", burstiness _, burstinessSql),
    Q("q_llm_kl_matrix", klMatrix _, klMatrixSql),
    Q("q_llm_source_entropy", sourceEntropy _, sourceEntropySql),
    Q("q_llm_backoff_lm", backoffLm _, backoffLmSql),
    Q("q_llm_ngram_entropy_rate", ngramEntropyRate _, ngramEntropyRateSql),
    Q("q_llm_template_prefix", templatePrefix _, templatePrefixSql),
    Q("q_llm_entropy", entropy _, entropySql),
    Q("q_llm_inverted_index", invertedIndex _, invertedIndexSql),
    Q("q_llm_bpe_pairs", bpePairs _, bpePairsSql),
    Q("q_llm_bpe_train", bpeTrain _, bpeTrainSql),
    Q("q_llm_bpe_encode", bpeEncode _, bpeEncodeSql),
    Q("q_llm_fertility", fertility _, fertilitySql),
    Q("q_llm_bigram_lm", bigramLm _, bigramLmSql),
    Q("q_llm_gopher", gopher _, gopherSql),
    Q("q_llm_chunk", chunk _, chunkSql),
    Q("q_llm_selfrepeat", selfRepeat _, selfRepeatSql),
    Q("q_llm_rarity", rarity _, raritySql),
    Q("q_llm_heaps", heaps _, heapsSql),
    Q("q_llm_vocab_overlap", vocabOverlap _, vocabOverlapSql),
    Q("q_llm_zipf", zipf _, zipfSql),
    Q("q_llm_novelty", novelty _, noveltySql),
    Q("q_llm_tfidf", tfidf _, tfidfSql),
    Q("q_llm_bm25", bm25 _, bm25Sql),
    Q("q_llm_text_stats", textStats _, textStatsSql),
    Q("q_llm_tokenize", tokenize _, tokenizeSql),
    Q("q_llm_winnow", winnow _, winnowSql),
    Q("q_llm_winnow_pairs", winnowPairs _, winnowPairsSql),
    Q("q_llm_quality", quality _, qualitySql),
    Q("q_llm_lang_profile", langProfile _, langProfileSql),
    Q("q_llm_lang_id", langId _, langIdSql),
    Q("q_llm_lang_confusion", langConfusion _, langConfusionSql),
    Q("q_llm_fingerprint", fingerprint _, fingerprintSql))
}
