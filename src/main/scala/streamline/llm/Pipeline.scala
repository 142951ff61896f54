package streamline.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import streamline.{Q, Tables}

/** §2.11 (continued) — training-data pipeline operators beyond
  * dedup/similarity: the selection / scrubbing / batching primitives a
  * 100-TB corpus pass needs between "raw crawl" and "training batches".
  * All four are per-row projections or keyed window aggregations — no
  * all-pairs anything — and every one is deterministic, so each
  * carries a full DuckDB oracle.
  */
object Pipeline {

  /** q_llm_sample_hash — deterministic content-hash sampling: keep a
    * document iff the first hex digit of md5(text) is '0' (a ~1/16
    * sample). The sample is a pure function of content — stable across
    * runs, machines and partitionings, reproducible by any engine, and
    * it needs no state, no RNG seed plumbing, no coordination — THE way
    * to subsample a corpus at scale (a seeded `sample()` is
    * partitioning-dependent and irreproducible across engines).
    * Identical-content duplicates land on the same side of the cut,
    * which is usually exactly what a corpus sample wants. */
  private def sampleHash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .where(substring(md5($"text"), 1, 1) === "0")
      .select($"doc_id", $"lang", $"n_chars")
      .orderBy($"doc_id")
  }

  /** q_llm_filter_cascade — quality-filter cascade with per-rule
    * attrition accounting (the audit trail every published corpus
    * reports — C4's and Gopher's filter tables): every document gets a
    * BITMASK of the rules it fails (1 = too short, 2 = low lexical
    * diversity, 4 = dominated by one token, 8 = short mean word length)
    * plus pass and first-failing-rule columns, so downstream can both
    * filter and attribute the cut. EVERY rule is an exact integer
    * cross-multiplication (`n_uniq·2 < n_words`, never
    * `n_uniq/n_words < 0.5`) — no float boundary exists, the mask is
    * bit-exact in any engine. Plan: one explode → per-(doc,word) count →
    * per-doc aggregate (two keyed shuffles, the word-frequency pass
    * shared by all four rules) → map-side mask arithmetic. */
  private def filterCascade(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wf = Tables.documents(spark, dir)
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("c"))
    val st = wf.groupBy($"doc_id").agg(
      sum($"c").cast("long").as("n_words"),
      count(lit(1)).cast("long").as("n_uniq"),
      max($"c").cast("long").as("max_freq"),
      sum(length($"w") * $"c").cast("long").as("n_wchars"))
    val masked = st.select($"doc_id", $"n_words",
      (when($"n_words" < 60, 1L).otherwise(0L)
        + when($"n_uniq" * 2 < $"n_words", 2L).otherwise(0L)
        + when($"max_freq" * 10 > $"n_words", 4L).otherwise(0L)
        + when($"n_wchars" < $"n_words" * 4, 8L).otherwise(0L))
        .as("mask"))
    masked.select($"doc_id", $"n_words", $"mask",
      ($"mask" === 0L).as("pass"),
      when($"mask" === 0L, 0L)
        .when($"mask" % 2 === 1L, 1L)
        .when($"mask" % 4 >= 2L, 2L)
        .when($"mask" % 8 >= 4L, 3L)
        .otherwise(4L).cast("long").as("first_fail"))
      .orderBy($"doc_id")
  }

  private val filterCascadeSql = """
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                  FROM documents),
    wf AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY doc_id, w),
    st AS (SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_words,
             CAST(count(*) AS BIGINT) AS n_uniq,
             CAST(max(c) AS BIGINT) AS max_freq,
             CAST(sum(length(w) * c) AS BIGINT) AS n_wchars
           FROM wf GROUP BY doc_id),
    m AS (SELECT doc_id, n_words,
            CAST((CASE WHEN n_words < 60 THEN 1 ELSE 0 END)
               + (CASE WHEN n_uniq * 2 < n_words THEN 2 ELSE 0 END)
               + (CASE WHEN max_freq * 10 > n_words THEN 4 ELSE 0 END)
               + (CASE WHEN n_wchars < n_words * 4 THEN 8 ELSE 0 END)
              AS BIGINT) AS mask
          FROM st)
    SELECT doc_id, n_words, mask,
      (mask = 0) AS pass,
      CAST(CASE WHEN mask = 0 THEN 0
           WHEN mask % 2 = 1 THEN 1
           WHEN mask % 4 >= 2 THEN 2
           WHEN mask % 8 >= 4 THEN 3
           ELSE 4 END AS BIGINT) AS first_fail
    FROM m ORDER BY doc_id"""

  /** q_llm_sample_weighted — weight-proportional Bernoulli sampling
    * (importance sampling: keep a document with probability ∝ its
    * weight — here n_chars, in a real pipeline a quality or DSIR
    * importance score; the selection shape of CC-Net / DoReMi-style
    * reweighting). Keep iff
    * `hash32 · max_w · 4 < w · 2^32`, i.e. p = w/(4·max_w), where
    * hash32 is the first 8 hex digits of md5(text) — the same
    * content-hash-as-uniform trick as q_llm_sample_hash, so the sample
    * is engine/partitioning/run-independent. The comparison is PURE
    * BIGINT arithmetic (no doubles, no ln): hash32 < 2^32 and
    * max_w ≤ 2^20 keep the product far under 2^63, so the cut is
    * bit-exact in any engine. At scale: one scalar max() broadcast as a
    * 1-row probe, then a map-only filter — no shuffle of the corpus. */
  private def sampleWeighted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val maxW = docs.agg(max($"n_chars").as("max_w"))
    docs.crossJoin(broadcast(maxW))
      .where(conv(substring(md5($"text"), 1, 8), 16, 10).cast("long")
        * $"max_w" * lit(4L) < $"n_chars" * lit(4294967296L))
      .select($"doc_id", $"lang", $"n_chars")
      .orderBy($"doc_id")
  }

  private val sampleWeightedSql = """
    SELECT doc_id, lang, n_chars FROM documents
    WHERE CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)
          * (SELECT max(n_chars) FROM documents) * 4
          < n_chars * 4294967296
    ORDER BY doc_id"""

  private val sampleHashSql = """
    SELECT doc_id, lang, n_chars FROM documents
    WHERE substring(md5(text), 1, 1) = '0'
    ORDER BY doc_id"""

  /** q_llm_redact — denylist scrubbing (the PII-removal shape: replace
    * every match of a sensitive-term/pattern list, count the hits for
    * audit). Pure per-row projection; the pattern set is a broadcast
    * constant at any scale. Word-boundary regex keeps both engines
    * (Java regex / RE2) in exact agreement. */
  private def redact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pat = "\\b(customer|supplier|order)\\b"
    Tables.documents(spark, dir)
      .select($"doc_id",
        // Column-function form, NOT expr(): a SQL string literal would
        // eat the \b escapes (\b → backspace) before the regex engine
        // ever saw them.
        size(regexp_extract_all($"text", lit(pat), lit(0))).cast("long")
          .as("n_hits"),
        regexp_replace($"text", pat, "[PII]").as("redacted"))
      .select($"doc_id", $"n_hits", length($"redacted").as("len_redacted"),
        substring($"redacted", 1, 80).as("head_redacted"))
      .orderBy($"doc_id")
  }

  private val redactSql = """
    SELECT doc_id,
      len(regexp_extract_all(text, '\b(customer|supplier|order)\b')) AS n_hits,
      length(regexp_replace(text, '\b(customer|supplier|order)\b',
                            '[PII]', 'g')) AS len_redacted,
      substring(regexp_replace(text, '\b(customer|supplier|order)\b',
                               '[PII]', 'g'), 1, 80) AS head_redacted
    FROM documents ORDER BY doc_id"""

  /** q_llm_pack — sequence packing: concatenate consecutive documents
    * (per language, in doc_id order) into packs of ≤512 tokens — the
    * batching step that turns a corpus into fixed-budget training
    * sequences. Greedy packing is a running-sum window: a document
    * starts a new pack when the budget its PREDECESSORS consumed
    * crosses a multiple of 512, i.e. pack_id = (cumsum − own) / 512.
    * One shuffle on lang, linear scan — at 100 TB the partition key
    * would be (lang, shard) with per-shard budgets, same window. */
  private def pack(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val budget = 512
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", $"lang",
        size(split($"text", " ")).cast("long").as("n_tok"))
    val w = Window.partitionBy($"lang").orderBy($"doc_id")
    toks
      .withColumn("cum", sum($"n_tok").over(w))
      .withColumn("pack_id", (($"cum" - $"n_tok") / budget).cast("long"))
      .groupBy($"lang", $"pack_id")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("sum_tok"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .orderBy($"lang", $"pack_id")
  }

  private val packSql = """
    WITH t AS (SELECT doc_id, lang,
                 len(string_split(text, ' ')) AS n_tok FROM documents),
    c AS (SELECT doc_id, lang, n_tok,
            sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) AS cum
          FROM t)
    SELECT lang, CAST((cum - n_tok) // 512 AS BIGINT) AS pack_id,
      count(*) AS n_docs,
      CAST(sum(n_tok) AS BIGINT) AS sum_tok, min(doc_id) AS first_doc,
      max(doc_id) AS last_doc
    FROM c GROUP BY lang, (cum - n_tok) // 512
    ORDER BY lang, pack_id"""

  /** q_llm_centroid — per-label mean embedding (the class-centroid
    * primitive under nearest-centroid classification, cluster seeding,
    * embedding drift checks). posexplode spreads each vector across
    * (label, dim) keys, so the aggregation is fully keyed — 64·|labels|
    * cells however many vectors stream through. Exactness: each float
    * is quantized ONCE to an integer at 1e-12 via floor (float→double
    * exact, ×1e12 IEEE-identical in both engines, floor has NO
    * tie-breaking — a decimal cast rounds, and Spark HALF_UP vs
    * DuckDB's tie rule diverged on a real fixture value), then integer
    * sums are exact and the final double divisions are IEEE-identical.
    */
  private def centroid(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select($"label", posexplode($"embedding").as(Seq("pos", "c")))
      .select($"label", ($"pos" + 1).as("dim"),
        floor($"c".cast("double") * lit(1e12)).cast("long").as("q"))
      .groupBy($"label", $"dim")
      .agg(((sum($"q").cast("double") / lit(1e12)) / count(lit(1)))
        .as("centroid"),
        count(lit(1)).as("n_vecs"))
      .orderBy($"label", $"dim")
  }

  // The series bound is derived from each row's own vector length (NOT a
  // hardcoded 64): a fixture with a different or ragged dimension keeps
  // the oracle aligned with Spark's posexplode instead of silently
  // counting NULL cells past the end of shorter vectors. (unnest in the
  // SELECT list — DuckDB's generate_series table function rejects
  // lateral column arguments.)
  private val centroidSql = """
    WITH x AS (SELECT label, embedding,
                 unnest(generate_series(1, len(embedding))) AS dim
               FROM embeddings)
    SELECT label, dim,
      (CAST(sum(CAST(floor(CAST(embedding[dim] AS DOUBLE) * 1e12)
                     AS BIGINT)) AS DOUBLE) / 1e12) / count(*) AS centroid,
      count(*) AS n_vecs
    FROM x GROUP BY label, dim ORDER BY label, dim"""

  /** q_llm_sample_stratified — per-stratum deterministic sampling: the
    * data-mixture step of corpus assembly (upsample the head language
    * less, keep more of the tail). Rate per language is applied by
    * comparing an md5 hex prefix of the CONTENT against a per-stratum
    * threshold — the same hash-threshold trick as q_llm_sample_hash, so
    * the sample is reproducible across runs/engines and survives
    * re-partitioning; '80' keeps ~50% (en), '40' keeps ~25% (rest).
    * Pure per-row projection + filter: no shuffle at any scale. */
  private def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val thr = when($"lang" === "en", lit("80")).otherwise(lit("40"))
    Tables.documents(spark, dir)
      .where(substring(md5($"text"), 1, 2) < thr)
      .select($"doc_id", $"lang", $"n_chars")
      .orderBy($"doc_id")
  }

  private val sampleStratifiedSql = """
    SELECT doc_id, lang, n_chars FROM documents
    WHERE substring(md5(text), 1, 2) <
      CASE WHEN lang = 'en' THEN '80' ELSE '40' END
    ORDER BY doc_id"""

  /** q_llm_shuffle — deterministic global shuffle of the training
    * order: sort by a salted content-independent hash of the doc id.
    * At scale this is exactly Spark's distributed sort (range exchange
    * on the hash key, partition-local sort) — no single-node pass; a
    * different salt is a different epoch's order. Emitted WITH the key
    * so the order is the witnessed output (row order is part of the
    * driver compare). */
  private def shuffleCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        md5(concat($"doc_id".cast("string"), lit(":epoch0"))).as("skey"))
      .orderBy($"skey", $"doc_id")
  }

  private val shuffleCorpusSql = """
    SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':epoch0') AS skey
    FROM documents ORDER BY skey, doc_id"""

  /** q_llm_pipeline — the END-TO-END corpus assembly a training-data
    * user actually runs, composed from this library's own stages in
    * their production order: language gate → exact dedup (keep lowest
    * doc_id per sha256) → deterministic hash sample (md5-prefix 50%) →
    * sequence packing to a 512-token budget. One declarative chain, so
    * Catalyst plans it whole: the filters reach the scan, dedup is the
    * single wide shuffle, the sample is a projection-level cut BEFORE
    * the packing window — each stage shrinks the data the next one
    * pays for, which is the property that matters at 100 TB.
    *
    * The packing cumsum is a DISTRIBUTED prefix sum, not a global
    * `Window.orderBy` (which plans a single-partition sort at any
    * scale): range-partition by doc_id, scan each partition once for
    * its token total, broadcast the 8-entry running offsets back, and
    * let each partition compute its local cumsum on top of its offset.
    * Two linear passes, no single-node stage. */
  private def pipelineE2e(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val budget = 512L
    val nParts = 8
    val survivors = Tables.documents(spark, dir)
      .where($"lang" === "en")
      .select($"doc_id", $"text", sha2($"text", 256).as("h"))
      .withColumn("rn",
        row_number().over(Window.partitionBy($"h").orderBy($"doc_id".asc)))
      .where($"rn" === 1)
      .where(substring(md5($"text"), 1, 1) < "8")
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n_tok"))
      .repartitionByRange(nParts, $"doc_id")
      .sortWithinPartitions($"doc_id")
      .as[(Long, Long)]
      .persist()
    // pass 1: per-partition token totals → running offsets (8 numbers
    // on the driver — metadata-scale, like Flink's iteration aggregators)
    val totals = survivors.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        Iterator.single(pid -> it.map(_._2).sum)
      }.collect().toMap
    val offsets = (0 until nParts).map { pid =>
      pid -> (0 until pid).map(p => totals.getOrElse(p, 0L)).sum
    }.toMap
    val bcOff = survivors.sparkSession.sparkContext.broadcast(offsets)
    // pass 2: local cumsum on top of the partition offset
    val packed = survivors.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var cum = bcOff.value(pid)
        it.map { case (id, tok) => cum += tok; (id, tok, cum) }
      }
      .toDF("doc_id", "n_tok", "cum")
    val out = packed
      .withColumn("pack_id", expr(s"(cum - n_tok) div $budget"))
      .groupBy($"pack_id")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("sum_tok"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .orderBy($"pack_id")
    val result = out.cache()
    result.count() // materialize before unpersisting the input
    survivors.unpersist()
    result
  }

  private val pipelineE2eSql = """
    WITH d AS (SELECT doc_id, text, sha256(text) AS h,
                 row_number() OVER (PARTITION BY sha256(text)
                                    ORDER BY doc_id ASC) AS rn
               FROM documents WHERE lang = 'en'),
    s AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tok
          FROM d WHERE rn = 1 AND substring(md5(text), 1, 1) < '8'),
    c AS (SELECT doc_id, n_tok,
            sum(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
              AS cum
          FROM s)
    SELECT CAST((cum - n_tok) // 512 AS BIGINT) AS pack_id,
      count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS sum_tok,
      min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM c GROUP BY (cum - n_tok) // 512
    ORDER BY pack_id"""

  /** q_llm_mix — domain-mixture resampling: reweight a corpus toward
    * target per-domain proportions (the DoReMi / data-mixing step every
    * large pretraining run applies: up-sample scarce high-value
    * domains, down-sample the over-represented crawl bulk). Each
    * source s gets keep-rate `min(1, target_share_s / actual_share_s)`
    * (here target weights cycle 1..4 over the source index — the
    * weights are the tunable, the MACHINERY is the witness), and a
    * document survives iff its 16-bit content-hash fraction falls
    * under its domain's rate — the same stateless, partitioning-proof,
    * engine-reproducible hash cut as q_llm_sample_hash, so the sample
    * is a pure function of (content, weights). Scale shape: one tiny
    * per-domain count aggregate (domains, not documents) broadcast
    * back onto the corpus; the cut itself is map-side. The rate
    * arithmetic stays in exact integer products until ONE double
    * division (`wt·N / (Σwt·n)`) — identical IEEE result in both
    * engines — and the hash compare is long < double, exact in the
    * 16-bit range. */
  private def mix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val w = docs.groupBy($"source")
      .agg(count(lit(1)).as("n"))
      .withColumn("wt",
        substring($"source", 4, 10).cast("long") % 4 + 1)
      .localCheckpoint(true) // totals + rates both read it: one corpus pass
    val tot = w.agg(sum($"n").as("n_tot"), sum($"wt").as("wt_tot"))
    val rates = w.crossJoin(broadcast(tot))
      .withColumn("rate",
        ($"wt" * $"n_tot").cast("double")
          / ($"wt_tot" * $"n").cast("double"))
      .select($"source", $"rate")
    docs.join(broadcast(rates), "source")
      .where(conv(substring(md5($"text"), 1, 4), 16, 10).cast("long")
        < $"rate" * 65536.0)
      .select($"doc_id", $"source")
      .orderBy($"doc_id")
  }

  private val mixSql = """
    WITH w AS (SELECT source, count(*) AS n,
                 (CAST(substring(source, 4) AS BIGINT) % 4) + 1 AS wt
               FROM documents GROUP BY source),
    t AS (SELECT source,
            CAST(wt * (SELECT sum(n) FROM w) AS DOUBLE)
            / CAST((SELECT sum(wt) FROM w) * n AS DOUBLE) AS rate
          FROM w)
    SELECT d.doc_id, d.source
    FROM documents d JOIN t ON d.source = t.source
    WHERE CAST('0x' || substring(md5(d.text), 1, 4) AS BIGINT)
          < rate * 65536
    ORDER BY d.doc_id"""

  /** q_llm_dataset_card — the per-(lang, source) dataset-card profile
    * every corpus release ships: volume (docs, words, chars), exact
    * duplicate mass (docs minus distinct sha256 texts — the number a
    * curation report quotes before any fuzzy dedup), a quality proxy
    * (mean stopword ratio), and the most frequent token with a total
    * (count DESC, word ASC) tie order. One pass over the corpus: the
    * volume/dup/quality columns are a single keyed aggregate (the
    * per-doc ratio is quantized to DECIMAL(18,4) BEFORE summing — the
    * Det discipline, so the mean is merge-order exact); the top token
    * is a (lang, source, word) count + max_by argmax, the q_agg_mode
    * shape, vocabulary-sized after its own map-side combine. */
  private def datasetCard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import streamline.util.Det.{asDouble, dec}
    val w = split($"text", " ")
    val stopRatio = size(filter(w,
      x => x.isin("the", "a", "of", "and", "to", "in"))).cast("double") /
      size(w).cast("double")
    val base = Tables.documents(spark, dir)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"),
        (count(lit(1)) - countDistinct(sha2($"text", 256)))
          .as("n_dup_docs"),
        sum(size(w)).as("sum_words"),
        sum(length($"text")).as("sum_chars"),
        (asDouble(sum(dec(stopRatio))) / count(lit(1)).cast("double"))
          .as("avg_stop_ratio"))
    val top = Tables.documents(spark, dir)
      .select($"lang", $"source", explode(w).as("word"))
      .where($"word" =!= "")
      .groupBy($"lang", $"source", $"word")
      .agg(count(lit(1)).as("n"))
      .groupBy($"lang", $"source")
      // (count DESC, word ASC) tie order without negating a string:
      // min_by over the (−n, word) struct — the q_agg_mode discipline.
      .agg(min_by($"word", struct((-$"n").as("nn"), $"word"))
          .as("top_word"),
        max($"n").as("top_word_n"))
    base.join(top, Seq("lang", "source"))
      .orderBy($"lang", $"source")
  }

  private val datasetCardSql = """
    WITH base AS (
      SELECT lang, source, count(*) AS n_docs,
        count(*) - count(DISTINCT sha256(text)) AS n_dup_docs,
        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_words,
        CAST(sum(length(text)) AS BIGINT) AS sum_chars,
        CAST(sum(CAST(
          CAST(len(list_filter(string_split(text, ' '),
            x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE)
          / CAST(len(string_split(text, ' ')) AS DOUBLE)
          AS DECIMAL(18,4))) AS DOUBLE) / CAST(count(*) AS DOUBLE)
          AS avg_stop_ratio
      FROM documents GROUP BY lang, source),
    counts AS (
      SELECT lang, source, word, count(*) AS n FROM (
        SELECT lang, source, unnest(string_split(text, ' ')) AS word
        FROM documents)
      WHERE word <> '' GROUP BY lang, source, word),
    top AS (
      SELECT lang, source, word AS top_word, n AS top_word_n FROM (
        SELECT lang, source, word, n, row_number() OVER (
          PARTITION BY lang, source ORDER BY n DESC, word ASC) AS rn
        FROM counts) WHERE rn = 1)
    SELECT lang, source, n_docs, n_dup_docs, sum_words, sum_chars,
      avg_stop_ratio, top_word, top_word_n
    FROM base JOIN top USING (lang, source)
    ORDER BY lang, source"""

  /** q_llm_dsir — Data Selection with Importance Resampling (DSIR,
    * Xie et al. 2023, arXiv:2302.03169), the published recipe for
    * "pick raw-corpus documents that look like the target domain":
    * fit unigram LMs over the TARGET slice (here lang = 'en' — the
    * domain exemplar) and the RAW corpus, score every document by its
    * summed log importance ratio Σ_w log(p_target(w)/p_raw(w)) with
    * add-1 smoothing, and keep the top quarter. Determinism
    * discipline: each word's log-ratio is computed once
    * (vocabulary-sized table), ROUNDED to 8 decimals and cast to
    * DECIMAL — so the per-document sum is exact and order-independent
    * (a raw double sum would be partition-order-dependent), and the
    * selection threshold is rank-based with doc_id tie-break. Scale:
    * the ratio table is vocabulary-sized (broadcast back — DSIR hashes
    * features into buckets for exactly this boundedness; with a
    * word-count-bounded fixture the words themselves are the buckets),
    * the corpus is touched twice (count pass + score pass), and the
    * top-k cut is a TakeOrdered (per-partition heaps, no global sort)
    * plus a single-row driver fetch of the k-th score — metadata-scale
    * like the BPE merge loop. */
  /** The md5-prefix feature hash of q_llm_dsir_hashed: 3 hex chars =
    * exactly 4096 buckets, deterministic and ENGINE-PORTABLE (Spark's
    * md5 and DuckDB's agree byte-for-byte, so the hashed variant keeps
    * a full oracle where an engine-internal murmur would not).
    * Boundedness pinned on an open 20k-word vocabulary in
    * LlmSelectionSpec. */
  private[streamline] def dsirHashBucket(w: Column): Column =
    conv(substring(md5(w), 1, 3), 16, 10).cast("long")

  private def dsir(spark: SparkSession, dir: String): DataFrame =
    dsirImpl(spark, dir, identity)

  /** q_llm_dsir_hashed — DSIR over HASHED features (the paper's §2
    * boundedness mechanism): words map into a FIXED 4096-bucket space
    * before the unigram models are fit, so the importance-ratio table —
    * the thing broadcast back over the corpus — is ≤ 4096 rows on ANY
    * vocabulary, open or not. q_llm_dsir's word-keyed table is only
    * safe because the fixture's vocabulary is bounded; this twin is the
    * shape a 100 TB open-vocabulary run must use. Hash collisions
    * coarsen the model (the paper's accepted trade), but everything
    * stays deterministic, so the oracle is exact. */
  private def dsirHashed(spark: SparkSession, dir: String): DataFrame =
    dsirImpl(spark, dir, dsirHashBucket)

  /** The UNMATERIALIZED per-document score plan of [[dsirImpl]],
    * factored out so PlanAuditSpec can keep pinning the scale contract
    * it carries — the vocabulary-/4096-bucket-sized log-ratio table
    * must BROADCAST back over the corpus scan (a corpus shuffle for a
    * model-sized side is the 100 TB anti-shape). Since r21 that join
    * executes during the operator's scores materialization and is no
    * longer visible in the RETURNED plan (a checkpointed leaf), so the
    * audit reads it from here. Returns (words, counts, scoresPlan)
    * with words/counts persisted — the caller owns the unpersists. */
  private[streamline] def dsirScoresPlan(spark: SparkSession, dir: String,
      feature: Column => Column): (DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    // persisted across the two passes (count model, then score): the
    // operator's four actions otherwise re-scan and re-explode the
    // corpus each time. MEMORY_AND_DISK default — spills, never OOMs;
    // at full corpus scale drop the persist and pay the second scan.
    val words = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", explode(split($"text", " ")).as("w0"))
      .select($"doc_id", $"lang", feature($"w0").as("w"))
      .persist()
    val counts = words.groupBy($"w").agg(
      count(lit(1)).as("c_all"),
      sum(when($"lang" === "en", 1L).otherwise(0L)).as("c_en"))
      .persist()
    val tot = counts.agg(sum($"c_all"), sum($"c_en"), count(lit(1))).head()
    val (nAll, nEn, v) = (tot.getLong(0), tot.getLong(1), tot.getLong(2))
    val lr = counts.select($"w",
      round(log((($"c_en" + 1.0) * lit((nAll + v).toDouble)) /
          (($"c_all" + 1.0) * lit((nEn + v).toDouble))), 8)
        .cast("decimal(18,8)").as("lr"))
    (words, counts,
      words.join(broadcast(lr), "w")
        .groupBy($"doc_id").agg(sum($"lr").as("s")))
  }

  /** Exposed for PlanAuditSpec: the hashed twin's feature map. */
  private[streamline] def dsirFeatures(hashed: Boolean): Column => Column =
    if (hashed) dsirHashBucket else identity

  private def dsirImpl(spark: SparkSession, dir: String,
      feature: Column => Column): DataFrame = {
    import spark.implicits._
    val (words, counts, scoresPlan) = dsirScoresPlan(spark, dir, feature)
    // localCheckpoint (eager), not persist: the scores table feeds the
    // count, the cut probe AND the returned plan. The old persist +
    // unpersist-before-return shape released the cache but left the
    // returned plan lazy — the caller's final execution then re-derived
    // scores from the raw corpus, re-running the whole operator
    // (measured ~40% of bench time). A checkpointed leaf is both
    // leak-free (blocks follow the DataFrame's lifetime via the
    // ContextCleaner, nothing stays in the session cache catalog) and
    // recompute-free. The doc count rides the checkpoint job as an
    // observed metric instead of a separate count() action.
    val scoresObs = org.apache.spark.sql.Observation()
    val scores = scoresPlan
      .observe(scoresObs, count(lit(1)).as("n"))
      .localCheckpoint(true)
    val n = scoresObs.get("n").asInstanceOf[Long]
    val k = (n / 4).toInt
    // the k-th (score desc, doc_id asc) row defines the cut; fetching
    // it is ONE driver row, and limit(k) plans as TakeOrdered
    val selected =
      if (k == 0) lit(false)
      else {
        val cut = scores.orderBy($"s".desc, $"doc_id".asc).limit(k)
          .orderBy($"s".asc, $"doc_id".desc).limit(1).head()
        val (cutS, cutId) = (cut.getDecimal(1), cut.getLong(0))
        $"s" > cutS || ($"s" === cutS && $"doc_id" <= cutId)
      }
    val out = scores.select($"doc_id", $"s".cast("double").as("score"),
        selected.as("selected"))
      .orderBy($"doc_id")
    // ALL operator-internal session caches released before returning
    // (the cacheReuse discipline, Relational.scala cacheReuse): a
    // returned query must not pin doc-count-sized storage in the
    // session cache catalog. `scores` itself is a checkpointed leaf
    // whose blocks the ContextCleaner drops with the returned
    // DataFrame, so the final execution reads the materialized rows
    // instead of re-deriving them from the corpus. Pinned leak-free in
    // LlmSelectionSpec.
    counts.unpersist()
    words.unpersist()
    out
  }

  // The two oracles share everything but the feature expression: the
  // hashed twin maps each word through the same md5-prefix bucket as
  // the Spark side (both engines' md5 hex agrees byte-for-byte).
  private def dsirSqlFor(wordExpr: String) = s"""
    WITH words AS (SELECT doc_id, lang, $wordExpr AS w
                   FROM (SELECT doc_id, lang,
                           unnest(string_split(text, ' ')) AS w0
                         FROM documents)),
    counts AS (SELECT w, count(*) AS c_all,
                 sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_en
               FROM words GROUP BY w),
    tot AS (SELECT sum(c_all) AS n_all, sum(c_en) AS n_en,
                   count(*) AS v FROM counts),
    lr AS (SELECT w, CAST(round(ln(((c_en + 1.0) * (n_all + v))
                                 / ((c_all + 1.0) * (n_en + v))), 8)
                          AS DECIMAL(18,8)) AS lr
           FROM counts, tot),
    scores AS (SELECT doc_id, sum(lr) AS s
               FROM words JOIN lr USING (w) GROUP BY doc_id),
    ranked AS (SELECT doc_id, s,
                 row_number() OVER (ORDER BY s DESC, doc_id) AS rn,
                 count(*) OVER () AS n
               FROM scores)
    SELECT doc_id, CAST(s AS DOUBLE) AS score, rn * 4 <= n AS selected
    FROM ranked ORDER BY doc_id"""

  private val dsirSql = dsirSqlFor("w0")
  private val dsirHashedSql =
    dsirSqlFor("CAST(('0x' || substr(md5(w0), 1, 3)) AS BIGINT)")

  /** q_llm_mix_temperature — temperature-based corpus mixing (the
    * multilingual-sampling rule of XLM/mBERT and the data-mixing knob
    * of the Gopher/Chinchilla lineage): sampling share ∝ n^α with
    * α = 0.5, which UP-samples small languages relative to their raw
    * mass. Where q_llm_mix applies per-source RATES (expected counts),
    * this allocates an exact document BUDGET (N = 200) by the
    * largest-remainder method and fills each quota deterministically
    * by content-hash order — quota-exact output sizes, reproducible
    * under any partitioning. Cross-engine determinism: √n is rounded
    * and scaled to an INTEGER weight, so the whole allocation
    * (floor division, remainders, ranking) is integer arithmetic —
    * no float comparison anywhere. Assumes budget ≪ corpus (every
    * quota ≤ its group size — the mixing regime; a capped variant
    * would re-distribute overflow). Scale: two group-sized aggregates,
    * a groups-count-sized allocation table broadcast back, and one
    * keyed window for the quota fill. */
  private def mixTemperature(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val budget = 200L
    val docs = Tables.documents(spark, dir)
    val w = docs.groupBy($"lang").agg(count(lit(1)).as("n"))
      .withColumn("u",
        (round(sqrt($"n".cast("double")), 6).cast("decimal(18,6)") *
          lit(1000000)).cast("long"))
      // four DAG branches read w (per-lang quota, its total, the
      // leftover count and the fill) — checkpoint or each re-plans the
      // corpus groupBy (r15 plan-audit class)
      .localCheckpoint(true)
    val withTot = w.crossJoin(broadcast(w.agg(sum($"u").as("ut"))))
      .withColumn("base", expr(s"($budget * u) div ut"))
      .withColumn("rem", expr(s"($budget * u) % ut"))
    val leftover = withTot.crossJoin(
        broadcast(withTot.agg((lit(budget) - sum($"base")).as("lo"))))
    // the allocation table is groups-count-sized: the single-partition
    // window below runs over a handful of rows, never the corpus
    val rankW = org.apache.spark.sql.expressions.Window
      .orderBy($"rem".desc, $"lang".asc)
    val quotas = leftover
      .withColumn("rk", row_number().over(rankW))
      .withColumn("quota",
        $"base" + when($"rk" <= $"lo", 1L).otherwise(0L))
      .select($"lang", $"quota")
    val fillW = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy(md5($"text").asc, $"doc_id".asc)
    docs.join(broadcast(quotas), "lang")
      .withColumn("rn", row_number().over(fillW))
      .where($"rn" <= $"quota")
      .select($"doc_id", $"lang", $"quota")
      .orderBy($"doc_id")
  }

  private val mixTemperatureSql = """
    WITH w AS (SELECT lang, count(*) AS n,
                 CAST(CAST(round(sqrt(n), 6) AS DECIMAL(18,6)) * 1000000
                      AS BIGINT) AS u
               FROM documents GROUP BY lang),
    t AS (SELECT lang, u, (200 * u) // (SELECT sum(u) FROM w) AS base,
                 (200 * u) % (SELECT sum(u) FROM w) AS rem
          FROM w),
    q AS (SELECT lang, base
            + CASE WHEN row_number() OVER (ORDER BY rem DESC, lang)
                     <= 200 - (SELECT sum(base) FROM t)
                   THEN 1 ELSE 0 END AS quota
          FROM t),
    f AS (SELECT d.doc_id, d.lang, q.quota,
                 row_number() OVER (PARTITION BY d.lang
                   ORDER BY md5(d.text), d.doc_id) AS rn
          FROM documents d JOIN q ON d.lang = q.lang)
    SELECT doc_id, lang, CAST(quota AS BIGINT) AS quota
    FROM f WHERE rn <= quota
    ORDER BY doc_id"""

  val all: Seq[Q] = Seq(
    Q("q_llm_pipeline", pipelineE2e _, pipelineE2eSql),
    Q("q_llm_dsir", dsir _, dsirSql),
    Q("q_llm_dsir_hashed", dsirHashed _, dsirHashedSql),
    Q("q_llm_mix_temperature", mixTemperature _, mixTemperatureSql),
    Q("q_llm_dataset_card", datasetCard _, datasetCardSql),
    Q("q_llm_mix", mix _, mixSql),
    Q("q_llm_sample_hash", sampleHash _, sampleHashSql),
    Q("q_llm_sample_weighted", sampleWeighted _, sampleWeightedSql),
    Q("q_llm_filter_cascade", filterCascade _, filterCascadeSql),
    Q("q_llm_sample_stratified", sampleStratified _, sampleStratifiedSql),
    Q("q_llm_shuffle", shuffleCorpus _, shuffleCorpusSql),
    Q("q_llm_redact", redact _, redactSql),
    Q("q_llm_pack", pack _, packSql),
    Q("q_llm_centroid", centroid _, centroidSql))
}
