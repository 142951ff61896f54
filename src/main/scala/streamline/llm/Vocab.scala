package streamline.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import streamline.{Q, Tables}

/** §2.11 [C] vocabulary / language-model corpus operators: the trigram
  * conditional-probability table a KenLM-style model build starts from,
  * document-frequency vocabulary pruning (the stopword/hapax cut of a
  * tokenizer or index pipeline), and CCNet-style perplexity bucketing
  * (Wenzek et al. 2020 — split the corpus into head/middle/tail quality
  * tiers per language by LM score).
  *
  * Scale posture: model tables (trigram counts, df table) are
  * vocabulary-sized — orders of magnitude below the corpus — so every
  * model-side join BROADCASTS and the corpus contributes only keyed
  * aggregations. The bucketing window partitions by language, which at
  * 100 TB is the natural parallel unit (each language's rank sort is an
  * independent range exchange; no global sort).
  */
object Vocab {

  /** Non-empty whitespace tokens (same guard as Text.lmScores: a
    * trailing/double space must not mint an empty token). */
  private val toks = expr("filter(split(text, ' '), x -> x <> '')")

  private val MIN_C3 = 3
  private val TOP_LM = 200

  /** q_llm_ngram_lm — the trigram LM TABLE build (the KenLM/CCNet model
    * half; q_llm_bigram_lm is the scoring half): corpus-wide trigram
    * counts, their bigram-prefix marginals, and the MLE conditional
    * P(w3|w1,w2) = c3/c2, min count 3, top 200 by count.
    *
    * Plan: ONE keyed groupBy over the exploded trigram stream builds
    * c3; the prefix table c2 derives from c3 (vocabulary-sized, never
    * re-touches the corpus) and BROADCASTS back. The probability is a
    * single IEEE double division shaped identically to the oracle's,
    * rounded 6 dp; the top-200 order is total (c3 desc, then the
    * trigram itself) so the limit boundary is deterministic. At 100 TB
    * the corpus contributes exactly one map-side-combined shuffle keyed
    * by trigram; everything after is model-sized. */
  private def ngramLm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = Tables.documents(spark, dir)
      .select(toks.as("t"))
      .select(explode(expr(
        """zip_with(
             zip_with(slice(t, 1, size(t) - 2), slice(t, 2, size(t) - 2),
                      (a, b) -> struct(a, b)),
             slice(t, 3, size(t) - 2),
             (ab, c) -> struct(ab.a AS w1, ab.b AS w2, c AS w3))"""))
        .as("g"))
      .select($"g.w1", $"g.w2", $"g.w3")
    val c3 = g.groupBy($"w1", $"w2", $"w3").agg(count(lit(1)).as("c3"))
    val c2 = c3.groupBy($"w1", $"w2").agg(sum($"c3").as("c2"))
    c3.where($"c3" >= MIN_C3)
      .join(broadcast(c2), Seq("w1", "w2"))
      .select($"w1", $"w2", $"w3", $"c3", $"c2",
        round($"c3".cast("double") / $"c2".cast("double"), 6).as("p"))
      .orderBy($"c3".desc, $"w1".asc, $"w2".asc, $"w3".asc)
      .limit(TOP_LM)
  }

  private val ngramLmSql = s"""
    WITH t AS (SELECT list_filter(string_split(text, ' '), x -> x <> '')
                 AS t
               FROM documents),
    g AS (SELECT t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3
          FROM t, UNNEST(generate_series(1, len(t) - 2)) AS u(i)),
    tc AS (SELECT w1, w2, w3, count(*) AS c3 FROM g GROUP BY 1, 2, 3),
    pc AS (SELECT w1, w2, sum(c3) AS c2 FROM tc GROUP BY 1, 2)
    SELECT w1, w2, w3, CAST(c3 AS BIGINT) AS c3, CAST(c2 AS BIGINT) AS c2,
      round(CAST(c3 AS DOUBLE) / CAST(c2 AS DOUBLE), 6) AS p
    FROM tc JOIN pc USING (w1, w2)
    WHERE c3 >= $MIN_C3
    ORDER BY c3 DESC, w1 ASC, w2 ASC, w3 ASC
    LIMIT $TOP_LM"""

  // Stopword cap: drop tokens present in > STOP_PCT% of docs; hapax
  // floor: drop df < MIN_DF. Integer comparisons (df·100 vs pct·N) so
  // the boundary is engine-exact. The fixture vocabulary is dense
  // (min df = 5% of docs), so the hapax rule is exercised only by the
  // spec's synthetic frame — on a real corpus it does the heavy cutting.
  private val STOP_PCT = 78
  private val MIN_DF = 2

  /** q_llm_df_prune — document-frequency vocabulary pruning with text
    * reconstruction: compute df per token, drop corpus-stopwords
    * (df > 78% of docs) and hapax noise (df < 2), and re-emit each
    * document's surviving tokens in original order. The standard
    * vocabulary cut between tokenization and indexing/LM training.
    *
    * Plan: the df table is vocabulary-sized ⇒ BROADCAST into the
    * token stream (the corpus side never shuffles for the filter); the
    * reconstruction is one groupBy(doc_id) whose order key is the token
    * POSITION carried through the explode — `array_sort` over
    * (pos, tok) structs, positions unique per doc, so the rebuilt text
    * is deterministic under any shuffle order. Corpus cost: one
    * posexplode + one keyed agg by doc_id. */
  private def dfPrune(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val t = docs.select($"doc_id", posexplode(toks).as(Seq("pos", "tok")))
    val df = t.groupBy($"tok").agg(count_distinct($"doc_id").as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val kept = t.join(broadcast(df), "tok")
      .crossJoin(broadcast(n))
      .where($"df" * 100 <= lit(STOP_PCT) * $"n" && $"df" >= MIN_DF)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct($"pos", $"tok"))),
          x => x.getField("tok")), " ").as("kept_text"))
    docs.select($"doc_id", size(toks).cast("bigint").as("n_tok"))
      .join(kept, Seq("doc_id"), "left")
      .select($"doc_id", $"n_tok",
        coalesce($"n_kept", lit(0L)).as("n_kept"),
        coalesce($"kept_text", lit("")).as("kept_text"))
      .orderBy($"doc_id")
  }

  private val dfPruneSql = s"""
    WITH w AS (SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x <> '') AS w
               FROM documents),
    t AS (SELECT doc_id, i AS pos, w[i] AS tok
          FROM w, UNNEST(generate_series(1, len(w))) AS u(i)),
    df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM t GROUP BY tok),
    n AS (SELECT count(*) AS n FROM documents),
    kept AS (SELECT doc_id, count(*) AS n_kept,
               string_agg(tok, ' ' ORDER BY pos) AS kept_text
             FROM t JOIN df USING (tok) CROSS JOIN n
             WHERE df * 100 <= $STOP_PCT * n AND df >= $MIN_DF
             GROUP BY doc_id),
    base AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tok FROM w)
    SELECT base.doc_id, n_tok,
      CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept,
      coalesce(kept_text, '') AS kept_text
    FROM base LEFT JOIN kept ON base.doc_id = kept.doc_id
    ORDER BY base.doc_id"""

  /** q_llm_ppl_bucket — CCNet-style quality tiers (Wenzek et al. 2020):
    * score every document with the corpus bigram LM
    * (q_llm_bigram_lm's exact pipeline, shared code) and split each
    * LANGUAGE into head/middle/tail terciles by score. The standard
    * "keep head+middle, drop tail" pre-training data split.
    *
    * Plan: scoring is Text.lmScores (model tables broadcast, per-doc
    * pass shuffle-free); the tercile assignment is ntile(3) over a
    * per-language window with a TOTAL order (score desc, doc_id asc) so
    * equal scores cannot flip buckets between engines. Partitioning by
    * language keeps the sort a per-language range exchange at 100 TB —
    * there is no global sort. The ranked doubles are bit-identical
    * across engines because the scoring expression is (bigramLm's
    * hash-matched contract). */
  private def pplBucket(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s = Text.lmScores(spark, dir)
    val w = Window.partitionBy($"lang")
      .orderBy($"lm_score".desc, $"doc_id".asc)
    Tables.documents(spark, dir).select($"doc_id", $"lang")
      .join(s, "doc_id")
      .withColumn("bucket", ntile(3).over(w).cast("bigint"))
      .select($"doc_id", $"lang", $"lm_score", $"bucket",
        element_at(array(lit("head"), lit("middle"), lit("tail")),
          $"bucket".cast("int")).as("tier"))
      .orderBy($"lang", $"bucket", $"doc_id")
  }

  private val pplBucketSql = """
    WITH t AS (SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x <> '') AS t
               FROM documents),
    b AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
          FROM t, UNNEST(generate_series(1, len(t) - 1)) AS u(i)),
    cb AS (SELECT w1, w2, count(*) AS c_ab FROM b GROUP BY w1, w2),
    ca AS (SELECT w1, sum(c_ab) AS c_a FROM cb GROUP BY w1),
    s AS (SELECT doc_id,
            CAST(sum(CAST(round(c_ab / c_a, 9) AS DECIMAL(12,9)))
              AS DOUBLE) / count(*) AS lm_score
          FROM b JOIN cb USING (w1, w2) JOIN ca USING (w1)
          GROUP BY doc_id),
    r AS (SELECT d.doc_id, d.lang, lm_score,
            ntile(3) OVER (PARTITION BY d.lang
              ORDER BY lm_score DESC, d.doc_id ASC) AS bucket
          FROM documents d JOIN s ON d.doc_id = s.doc_id)
    SELECT doc_id, lang, lm_score, CAST(bucket AS BIGINT) AS bucket,
      CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
        ELSE 'tail' END AS tier
    FROM r
    ORDER BY lang, bucket, doc_id"""

  val all: Seq[Q] = Seq(
    Q("q_llm_ngram_lm", ngramLm _, ngramLmSql),
    Q("q_llm_df_prune", dfPrune _, dfPruneSql),
    Q("q_llm_ppl_bucket", pplBucket _, pplBucketSql))
}
