package streamline.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import streamline.{Q, Tables}

/** §2.11 [C] corpus-statistics operators over token SPANS: substring
  * (k-gram) duplication in the style of suffix-array training-data
  * dedup (Lee et al. 2022, "Deduplicating Training Data Makes Language
  * Models Better" — the k-gram formulation is the shuffle-friendly
  * approximation of the suffix-array exact one), PMI collocation
  * mining (Church & Hanks 1990), and sparse all-pairs document cosine
  * over salient-term signatures (the inverted-index/DISCO family).
  *
  * Scale posture: every operator is a keyed shuffle on a token, gram
  * hash, or pair key — no all-pairs joins, no driver-side loops. The
  * only broadcasts are vocabulary-sized (unigram table) or single-row
  * (corpus totals), both metadata-scale by construction.
  */
object Spans {

  /** Sliding k-grams as strings, one per start position, built from k
    * shifted `slice`s folded with `zip_with` — each slice evaluates
    * `split` once per ROW. The naive
    * `transform(sequence(...), i => slice(w, i, k))` form re-splits the
    * text once per ELEMENT inside the lambda (same pitfall
    * [[Dedup.shingles3]] documents; this is its k-ary generalization).
    */
  private[streamline] def kgrams(text: Column, k: Int): Column = {
    require(k >= 2, s"kgrams needs k >= 2, got $k")
    val w = split(text, " ")
    val n = greatest(size(w) - (k - 1), lit(0))
    (2 to k).foldLeft(slice(w, lit(1), n)) { (acc, j) =>
      zip_with(acc, slice(w, lit(j), n),
        (a, b) => concat(a, lit(" "), b))
    }
  }

  private val K = 8 // span length in tokens (docs run 10–99 tokens)

  /** q_llm_dedup_span — cross-document duplicated-SPAN coverage, the
    * k-gram form of suffix-array substring dedup (Lee et al. 2022): a
    * position is "duplicated" when the K-token gram starting there also
    * occurs in at least one OTHER document. Per document: token count,
    * number of duplicated gram starts, number of distinct token
    * positions covered by any duplicated gram (the union of the
    * [s, s+K-1] intervals — what a span-removal pass would cut), and
    * the covered fraction.
    *
    * Plan: grams are hashed to 64-bit once (the oracle stays on strings
    * and hash-matches — same collision argument as the Jaccard
    * pipeline); the duplicated-gram table is a groupBy on the gram hash
    * and joins back to the position table on that same hash, so both
    * sides shuffle on gh. Interval coverage and span counts come from
    * ONE pass over the duplicated positions (explode to covered
    * positions + multi-count-distinct), keyed by doc_id. At 100 TB
    * every stage is a keyed exchange on gram-hash or doc_id; nothing
    * is all-pairs and nothing lands on the driver. */
  private def dedupSpan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val g = docs
      .select($"doc_id", posexplode(kgrams($"text", K)))
      .select($"doc_id", $"pos", xxhash64($"col").as("gh"))
    // Grams seen in >= 2 distinct docs. One row per gh after the agg,
    // so the join back preserves g's cardinality (no fan-out).
    val dup = g.groupBy($"gh")
      .agg(count_distinct($"doc_id").as("nd"))
      .where($"nd" >= 2)
      .select($"gh")
    // Shuffle hash join on purpose: both sides exchange on gh, and the
    // exploded gram pipeline is computed once via ReuseExchange.
    val dupPos = g.hint("shuffle_hash")
      .join(dup, "gh")
      .select($"doc_id", $"pos")
    // BOTH per-doc statistics in ONE pass over dupPos (explode each
    // span to its K covered positions, then a multi-count-distinct —
    // one Expand, vs re-running the whole gram pipeline per branch):
    // dup_spans = distinct span starts, dup_tokens = distinct covered
    // positions (the interval union).
    val per = dupPos
      .select($"doc_id", $"pos",
        explode(sequence($"pos", $"pos" + (K - 1))).as("p"))
      .groupBy($"doc_id")
      .agg(count_distinct($"pos").as("dup_spans"),
        count_distinct($"p").as("dup_tokens"))
    docs.select($"doc_id", size(split($"text", " ")).cast("bigint").as("n_tok"))
      .join(per, Seq("doc_id"), "left")
      .select($"doc_id", $"n_tok",
        coalesce($"dup_spans", lit(0L)).as("dup_spans"),
        coalesce($"dup_tokens", lit(0L)).as("dup_tokens"),
        round(coalesce($"dup_tokens", lit(0L)) /
          $"n_tok".cast("double"), 6).as("dup_frac"))
      .orderBy($"doc_id")
  }

  // posexplode is 0-based; the oracle's generate_series start is
  // 1-based, so positions are shifted to 0-based there (i - 1).
  private val dedupSpanSql = s"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
               FROM documents),
    e AS (SELECT doc_id, w,
            unnest(generate_series(1, len(w) - ${K - 1})) AS i
          FROM w),
    g AS (SELECT doc_id, i - 1 AS pos,
            array_to_string(w[i:i+${K - 1}], ' ') AS gram
          FROM e),
    dup AS (SELECT gram FROM g
            GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
    dp AS (SELECT doc_id, pos FROM g
           WHERE gram IN (SELECT gram FROM dup)),
    spans AS (SELECT doc_id, count(*) AS dup_spans FROM dp
              GROUP BY doc_id),
    cov AS (SELECT doc_id, count(*) AS dup_tokens FROM (
              SELECT DISTINCT doc_id, p FROM (
                SELECT doc_id,
                  unnest(generate_series(pos, pos + ${K - 1})) AS p
                FROM dp))
            GROUP BY doc_id),
    base AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT)
               AS n_tok
             FROM documents)
    SELECT base.doc_id, n_tok,
      CAST(coalesce(dup_spans, 0) AS BIGINT) AS dup_spans,
      CAST(coalesce(dup_tokens, 0) AS BIGINT) AS dup_tokens,
      round(CAST(coalesce(dup_tokens, 0) AS DOUBLE)
        / CAST(n_tok AS DOUBLE), 6) AS dup_frac
    FROM base
    LEFT JOIN spans ON base.doc_id = spans.doc_id
    LEFT JOIN cov ON base.doc_id = cov.doc_id
    ORDER BY base.doc_id"""

  /** q_llm_pmi — collocation mining by pointwise mutual information
    * (Church & Hanks 1990): adjacent-bigram counts vs unigram marginals,
    * PMI = log2(p(a,b) / (p(a)·p(b))), minimum pair count 5, top 100 by
    * PMI. The standard phrase-detection pass of a tokenizer/vocab
    * pipeline (word2vec's phrase join uses the same statistic).
    *
    * Plan: bigram counts are one keyed groupBy on (a, b); the unigram
    * table is vocabulary-sized and the corpus totals single-row — both
    * broadcast. PMI is computed from exact integer counts with ONE
    * float expression whose shape matches the oracle's
    * (`log2((cab·N²)/(nbi·ca·cb))`) so the IEEE result is bit-identical;
    * the value is rounded to 6 dp before the hash compare and the sort
    * tiebreaks on (a, b). At 100 TB: the groupBy scales with bigram
    * cardinality, and the unigram broadcast caps at vocabulary size — a
    * few MB for a real tokenizer vocab. */
  private def pmi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Tables.documents(spark, dir).select($"doc_id", $"text")
    // checkpoint both count tables: uni feeds THREE consumers (total +
    // two marginal joins) and biAll two (pair filter + total) — without
    // it each DAG branch re-explodes the corpus (r15 plan-audit class)
    val uni = w.select(explode(split($"text", " ")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val biAll = w.select(explode(kgrams($"text", 2)).as("g"))
      .select(split($"g", " ").as("ab"))
      .select($"ab".getItem(0).as("a"), $"ab".getItem(1).as("b"))
      .groupBy($"a", $"b").agg(count(lit(1)).as("cab"))
      .localCheckpoint(true)
    val bi = biAll.where($"cab" >= 5)
    // nbi = TOTAL bigram positions (pre-filter) — the probability
    // denominator; the min-count filter only gates which pairs report.
    val tot = uni.agg(sum($"c").as("nuni"))
      .crossJoin(broadcast(biAll.agg(sum($"cab").as("nbi"))))
    bi.join(broadcast(uni.withColumnRenamed("tok", "a")
          .withColumnRenamed("c", "ca")), "a")
      .join(broadcast(uni.withColumnRenamed("tok", "b")
          .withColumnRenamed("c", "cb")), "b")
      .crossJoin(broadcast(tot))
      .select($"a", $"b", $"cab", $"ca", $"cb",
        round(log2(($"cab".cast("double") * $"nuni" * $"nuni") /
          ($"nbi".cast("double") * $"ca" * $"cb")), 6).as("pmi"))
      .orderBy($"pmi".desc, $"a".asc, $"b".asc)
      .limit(100)
  }

  private val pmiSql = """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
               FROM documents),
    t AS (SELECT unnest(w) AS tok FROM w),
    uni AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
    e AS (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i FROM w),
    bi AS (SELECT w[i] AS a, w[i+1] AS b, count(*) AS cab FROM e
           GROUP BY 1, 2 HAVING count(*) >= 5),
    tot AS (SELECT (SELECT sum(c) FROM uni) AS nuni,
                   (SELECT count(*) FROM e) AS nbi)
    SELECT a, b, cab, ua.c AS ca, ub.c AS cb,
      round(log2((CAST(cab AS DOUBLE) * nuni * nuni)
        / (CAST(nbi AS DOUBLE) * ua.c * ub.c)), 6) AS pmi
    FROM bi
    JOIN uni ua ON ua.tok = a
    JOIN uni ub ON ub.tok = b
    CROSS JOIN tot
    ORDER BY pmi DESC, a ASC, b ASC
    LIMIT 100"""

  private val TOP_TERMS = 10
  private val COS_TAU = 0.6

  /** q_llm_tfidf_pairs — sparse all-pairs document cosine over
    * SALIENT-TERM signatures (the inverted-index / DISCO-family
    * similarity join): each document keeps its top-10 features by
    * frequency (tf desc, feature asc — a deterministic integer
    * ranking), candidate pairs come from a postings self-join on the
    * shared feature, and cosine = dot / sqrt(|a|·|b|) over the integer
    * tf weights. Complements q_llm_dedup_jaccard (set overlap, PPJoin
    * prefixes) and q_llm_dedup_embed (dense vectors) with the weighted
    * SPARSE path.
    *
    * Features are 3-token SHINGLES, not unigrams: the fixture's ~31-word
    * vocabulary makes every unigram a stopword (df ≈ corpus), so a
    * unigram postings join degenerates to all-pairs — measured 44 s at
    * sf0.1 vs ~3 s with shingles, the same degeneracy note as
    * [[Dedup.shingles3]]. On a real corpus the equivalent knob is a df
    * cap on hot terms (drop df > x% stopwords), which bounds the
    * postings quadratic exactly like the shingle space does here.
    *
    * Plan: tf and signatures are keyed by doc; the self-join is keyed
    * by feature (never all-pairs), and capping signatures at 10 terms
    * bounds the per-feature postings fan-out. Dot products and norms
    * stay EXACT integers (sum order can't perturb them — the one float
    * op is the final sqrt quotient, bit-identical to the oracle's), so
    * the hash compare is safe under shuffle reordering. */
  private def tfidfPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tf = Tables.documents(spark, dir)
      .select($"doc_id", explode(Dedup.shingles3($"text")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
    val rnW = Window.partitionBy($"doc_id")
      .orderBy($"tf".desc, $"tok".asc)
    // Materialized once: the signature feeds the norm table and both
    // sides of the postings self-join (same move as the Jaccard
    // pipeline's shingle table).
    val sig = tf.withColumn("rn", row_number().over(rnW))
      .where($"rn" <= TOP_TERMS)
      .select($"doc_id", $"tok", $"tf")
      .localCheckpoint(true)
    val nrm = sig.groupBy($"doc_id").agg(sum($"tf" * $"tf").as("n2"))
    val dot = sig.as("x").hint("shuffle_hash").join(sig.as("y"),
        $"x.tok" === $"y.tok" && $"x.doc_id" < $"y.doc_id")
      .groupBy($"x.doc_id".as("id_a"), $"y.doc_id".as("id_b"))
      .agg(sum($"x.tf" * $"y.tf").as("dot"))
    dot.join(broadcast(nrm.select($"doc_id".as("id_a"), $"n2".as("na"))),
        "id_a")
      .join(broadcast(nrm.select($"doc_id".as("id_b"), $"n2".as("nb"))),
        "id_b")
      .select($"id_a", $"id_b", $"dot",
        round($"dot" / sqrt($"na".cast("double") * $"nb"), 6).as("cos"))
      .where($"cos" >= COS_TAU)
      .orderBy($"id_a", $"id_b")
  }

  private val tfidfPairsSql = s"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
               FROM documents),
    e AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
          FROM w),
    t AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS tok FROM e),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM t
           GROUP BY doc_id, tok),
    sig AS (SELECT doc_id, tok, tf FROM (
              SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY tf DESC, tok ASC) AS rn
              FROM tf)
            WHERE rn <= $TOP_TERMS),
    nrm AS (SELECT doc_id, sum(tf * tf) AS n2 FROM sig GROUP BY doc_id),
    dot AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b,
              sum(x.tf * y.tf) AS dot
            FROM sig x JOIN sig y
              ON x.tok = y.tok AND x.doc_id < y.doc_id
            GROUP BY 1, 2)
    SELECT id_a, id_b, CAST(dot AS BIGINT) AS dot,
      round(CAST(dot AS DOUBLE)
        / sqrt(CAST(a.n2 AS DOUBLE) * b.n2), 6) AS cos
    FROM dot
    JOIN nrm a ON a.doc_id = id_a
    JOIN nrm b ON b.doc_id = id_b
    WHERE round(CAST(dot AS DOUBLE)
      / sqrt(CAST(a.n2 AS DOUBLE) * b.n2), 6) >= $COS_TAU
    ORDER BY id_a, id_b"""

  val all: Seq[Q] = Seq(
    Q("q_llm_dedup_span", dedupSpan _, dedupSpanSql),
    Q("q_llm_pmi", pmi _, pmiSql),
    Q("q_llm_tfidf_pairs", tfidfPairs _, tfidfPairsSql))
}
