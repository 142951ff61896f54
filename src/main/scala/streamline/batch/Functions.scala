package streamline.batch

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, MapType, StringType}
import streamline.{Q, Tables}
import streamline.util.Det._

/** §2.8 scalar function families — the built-in function surface of the
  * reference lineage (Flink 1.x Table API / Calcite standard library,
  * codegen'd per expression; SURVEY.md §2.8). One query per family, each
  * exercising 6–12 functions inside whole-stage codegen.
  *
  * Cross-engine dialect notes (vs the DuckDB oracle) are inline; the
  * general rules: decimal-cast before round on doubles, truncate event
  * timestamps to seconds, keep regexes POSIX-simple, never emit a raw
  * MAP column (compare keys/values as sorted arrays instead).
  */
object Functions {

  /** q_fn_string — concat/substring/case/trim/pad/replace/length/initcap/
    * LIKE/regexp_extract/split. */
  private def fnString(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .select($"p_partkey",
        concat($"p_brand", lit("-"), $"p_type").as("s_concat"),
        substring($"p_name", 1, 8).as("s_substr"),
        upper($"p_name").as("s_upper"),
        lower($"p_brand").as("s_lower"),
        trim(concat(lit("  "), $"p_type", lit("  "))).as("s_trim"),
        lpad($"p_brand", 12, "*").as("s_lpad"),
        expr("replace(p_name, ' ', '_')").as("s_replace"),
        length($"p_name").as("s_len"),
        initcap($"p_type").as("s_initcap"),
        $"p_type".like("%AND%").as("s_like"),
        regexp_extract($"p_name", "([a-z]+)", 1).as("s_re"),
        split($"p_name", " ").getItem(0).as("s_split0"))
      .orderBy($"p_partkey")
  }

  // initcap: p_type is a single uppercase word (measured domain), so the
  // DuckDB emulation is first-upper + rest-lower.
  private val fnStringSql = """
    SELECT p_partkey,
      p_brand || '-' || p_type AS s_concat,
      substring(p_name, 1, 8) AS s_substr,
      upper(p_name) AS s_upper,
      lower(p_brand) AS s_lower,
      trim('  ' || p_type || '  ') AS s_trim,
      lpad(p_brand, 12, '*') AS s_lpad,
      replace(p_name, ' ', '_') AS s_replace,
      length(p_name) AS s_len,
      upper(substring(p_type, 1, 1)) || lower(substring(p_type, 2))
        AS s_initcap,
      p_type LIKE '%AND%' AS s_like,
      regexp_extract(p_name, '([a-z]+)', 1) AS s_re,
      string_split(p_name, ' ')[1] AS s_split0
    FROM part ORDER BY p_partkey"""

  /** q_fn_date — extraction/trunc/arithmetic on dates. DuckDB dayofweek
    * is 0=Sunday, Spark is 1=Sunday → oracle adds 1. */
  private def fnDate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderkey",
        year($"o_orderdate").as("d_year"),
        month($"o_orderdate").as("d_month"),
        dayofmonth($"o_orderdate").as("d_day"),
        quarter($"o_orderdate").as("d_quarter"),
        dayofweek($"o_orderdate").as("d_dow"),
        dayofyear($"o_orderdate").as("d_doy"),
        tsOut(date_trunc("month", $"o_orderdate")).as("d_month_start"),
        date_add(to_date($"o_orderdate"), 30).as("d_plus30"),
        last_day($"o_orderdate").as("d_month_end"),
        datediff(to_date(lit("2000-01-01")), to_date($"o_orderdate"))
          .as("d_to_y2k"))
      .orderBy($"o_orderkey")
  }

  private val fnDateSql = """
    SELECT o_orderkey,
      year(o_orderdate) AS d_year,
      month(o_orderdate) AS d_month,
      day(o_orderdate) AS d_day,
      quarter(o_orderdate) AS d_quarter,
      dayofweek(o_orderdate) + 1 AS d_dow,
      dayofyear(o_orderdate) AS d_doy,
      date_trunc('month', o_orderdate) AS d_month_start,
      CAST(o_orderdate AS DATE) + 30 AS d_plus30,
      last_day(CAST(o_orderdate AS DATE)) AS d_month_end,
      date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01')
        AS d_to_y2k
    FROM orders ORDER BY o_orderkey"""

  /** q_fn_math — abs/round/floor/ceil/ln/exp/power/sqrt/mod/sign/
    * greatest/least. Transcendentals (ln/exp) are libm-dependent in the
    * last ulp → rounded to 6dp; round() goes through DECIMAL so the
    * half-up boundary is exact in both engines. */
  private def fnMath(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_linenumber",
        abs($"l_quantity" - 25).as("m_abs"),
        asDouble(round(dec("l_extendedprice"), 1)).as("m_round"),
        floor($"l_extendedprice").as("m_floor"),
        ceil($"l_extendedprice").as("m_ceil"),
        round(log($"l_extendedprice"), 6).as("m_ln"),
        round(exp($"l_discount"), 6).as("m_exp"),
        round(pow($"l_quantity", 2), 4).as("m_pow"),
        round(sqrt($"l_extendedprice"), 6).as("m_sqrt"),
        ($"l_orderkey" % 7).as("m_mod"),
        signum($"l_quantity" - 25).as("m_sign"),
        greatest($"l_quantity", $"l_discount" * 100).as("m_great"),
        least($"l_quantity", $"l_tax" * 100).as("m_least"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  private val fnMathSql = """
    SELECT l_orderkey, l_linenumber,
      abs(l_quantity - 25) AS m_abs,
      CAST(round(CAST(l_extendedprice AS DECIMAL(18,4)), 1) AS DOUBLE)
        AS m_round,
      CAST(floor(l_extendedprice) AS BIGINT) AS m_floor,
      CAST(ceil(l_extendedprice) AS BIGINT) AS m_ceil,
      round(ln(l_extendedprice), 6) AS m_ln,
      round(exp(l_discount), 6) AS m_exp,
      round(power(l_quantity, 2), 4) AS m_pow,
      round(sqrt(l_extendedprice), 6) AS m_sqrt,
      l_orderkey % 7 AS m_mod,
      CAST(sign(l_quantity - 25) AS DOUBLE) AS m_sign,
      greatest(l_quantity, l_discount * 100) AS m_great,
      least(l_quantity, l_tax * 100) AS m_least
    FROM lineitem ORDER BY l_orderkey, l_linenumber"""

  /** q_fn_cond — CASE WHEN / coalesce / nullif / if. */
  private def fnCond(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .select($"c_custkey",
        when($"c_acctbal" < 0, "neg")
          .when($"c_acctbal" < 5000, "mid")
          .otherwise("high").as("bal_class"),
        coalesce(expr("nullif(c_mktsegment, 'BUILDING')"), lit("-"))
          .as("seg_or_dash"),
        expr("if(c_acctbal > 9000, 'vip', 'std')").as("tier"),
        $"c_acctbal".isNull.as("bal_is_null"))
      .orderBy($"c_custkey")
  }

  private val fnCondSql = """
    SELECT c_custkey,
      CASE WHEN c_acctbal < 0 THEN 'neg'
           WHEN c_acctbal < 5000 THEN 'mid'
           ELSE 'high' END AS bal_class,
      coalesce(nullif(c_mktsegment, 'BUILDING'), '-') AS seg_or_dash,
      CASE WHEN c_acctbal > 9000 THEN 'vip' ELSE 'std' END AS tier,
      c_acctbal IS NULL AS bal_is_null
    FROM customer ORDER BY c_custkey"""

  /** q_fn_array — array ops on the embedding column (ArrayType(Float)).
    * Elements are widened to double then rounded; the sum uses an
    * explicit left fold in BOTH engines so accumulation order is
    * identical. Array-valued results are serialized to strings (the
    * driver comparator cannot hash raw ARRAY cells — CORRECTNESS_r01);
    * each element goes through DECIMAL(12,6) so both engines render the
    * identical fixed-scale text (raw doubles differ on scientific
    * notation). The slice/transform/sort array ops still run upstream. */
  private def fnArray(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def fmt(x: Column): Column =
      round(x.cast("double"), 6).cast("decimal(12,6)").cast("string")
    Tables.embeddings(spark, dir)
      .select($"vec_id",
        size($"embedding").as("a_dim"),
        round(element_at($"embedding", 1).cast("double"), 6).as("a_first"),
        concat_ws(",", transform(slice($"embedding", 1, 3), fmt _))
          .as("a_head"),
        concat_ws(",", transform(sort_array(slice($"embedding", 1, 5)), fmt _))
          .as("a_sorted_head"),
        round(aggregate($"embedding", lit(0.0d),
          (acc, x) => acc + x.cast("double")), 4).as("a_sum"),
        array_contains($"embedding", lit(0.0f)).as("a_has_zero"))
      .orderBy($"vec_id")
  }

  private val fnArraySql = """
    SELECT vec_id,
      len(embedding) AS a_dim,
      round(CAST(embedding[1] AS DOUBLE), 6) AS a_first,
      array_to_string(list_transform(embedding[1:3],
        x -> CAST(CAST(round(CAST(x AS DOUBLE), 6) AS DECIMAL(12,6)) AS VARCHAR)), ',') AS a_head,
      array_to_string(list_transform(list_sort(embedding[1:5]),
        x -> CAST(CAST(round(CAST(x AS DOUBLE), 6) AS DECIMAL(12,6)) AS VARCHAR)), ',') AS a_sorted_head,
      round(list_reduce(
        list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(embedding, x -> CAST(x AS DOUBLE))),
        (acc, x) -> acc + x), 4) AS a_sum,
      list_contains(embedding, 0.0) AS a_has_zero
    FROM embeddings ORDER BY vec_id"""

  /** q_fn_map — JSON → MAP, then key/value ops. The map itself is never
    * emitted (engine-specific rendering); keys come out as a sorted
    * array serialized with concat_ws (driver comparator cannot hash raw
    * ARRAY cells — CORRECTNESS_r01). */
  private def fnMap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val m = from_json($"props", MapType(StringType, LongType))
    Tables.events(spark, dir)
      .select($"event_id",
        concat_ws(",", sort_array(map_keys(m))).as("m_keys"),
        element_at(m, "k").as("m_k"),
        size(m).as("m_size"))
      .orderBy($"event_id")
  }

  private val fnMapSql = """
    SELECT event_id,
      array_to_string(list_sort(json_keys(props)), ',') AS m_keys,
      CAST(json_extract_string(props, '$.k') AS BIGINT) AS m_k,
      len(json_keys(props)) AS m_size
    FROM events ORDER BY event_id"""

  /** q_fn_json — string-level JSON path access. */
  private def fnJson(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_id",
        get_json_object($"props", "$.k").as("js_k"),
        from_json($"props", org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).getField("k").as("k_num"),
        ($"props".contains("k")).as("js_has_k"))
      .orderBy($"event_id")
  }

  private val fnJsonSql = """
    SELECT event_id,
      json_extract_string(props, '$.k') AS js_k,
      CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
      contains(props, 'k') AS js_has_k
    FROM events ORDER BY event_id"""

  /** q_fn_struct — nested ROW-type manipulation (the Table API's
    * composite ROW type and nested-field access/update; Flink
    * `Row`/`RowTypeInfo` with nested projections): build a nested
    * struct, EVOLVE it in place with `withField` (add a derived
    * field) and `dropFields` (remove the superseded one) — Spark's
    * nested-schema-evolution pair, which rewrites only the struct
    * expression, never the row — then project nested leaves back out.
    * Money is converted to integer cents via the explicit half-up
    * floor(x*100 + 0.5) shared with the oracle (no round()-tie
    * divergence). Flattened output keeps the oracle engine-neutral;
    * all struct surgery is codegen'd projection, no shuffle. */
  private def fnStruct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .select($"c_custkey",
        struct($"c_name".as("name"), $"c_acctbal".as("bal"),
          struct($"c_nationkey".as("nk"), $"c_mktsegment".as("seg"))
            .as("geo")).as("cust"))
      .withColumn("cust", $"cust".withField("bal_cents",
        floor($"cust.bal" * 100 + 0.5).cast("long")))
      .withColumn("cust", $"cust".dropFields("bal"))
      // nested-field update: uppercase the segment INSIDE the struct
      .withColumn("cust", $"cust".withField("geo.seg",
        upper($"cust.geo.seg")))
      .select($"c_custkey", $"cust.name".as("name"),
        $"cust.bal_cents".as("bal_cents"),
        $"cust.geo.nk".as("nationkey"), $"cust.geo.seg".as("segment"))
      .orderBy($"c_custkey")
  }

  private val fnStructSql = """
    SELECT c_custkey, c_name AS name,
      CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents,
      c_nationkey AS nationkey, upper(c_mktsegment) AS segment
    FROM customer ORDER BY c_custkey"""

  /** q_fn_bitwise — the bitwise scalar family (AND/OR/XOR/NOT, shifts,
    * popcount): flag fields, bitmap encodings, hash mixing — all
    * integer-exact, so the oracle needs no rounding discipline at all.
    * Every op is a codegen'd arithmetic instruction; outputs cast to
    * BIGINT on both sides so the column types hash identically. */
  private def fnBitwise(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderkey",
        $"o_orderkey".bitwiseAND($"o_custkey").as("b_and"),
        $"o_orderkey".bitwiseOR($"o_custkey").as("b_or"),
        $"o_orderkey".bitwiseXOR($"o_custkey").as("b_xor"),
        bitwise_not($"o_orderkey").as("b_not"),
        shiftleft($"o_custkey", 3).cast("long").as("b_shl"),
        shiftright($"o_orderkey", 2).cast("long").as("b_shr"),
        bit_count($"o_orderkey").cast("long").as("b_cnt"))
      .orderBy($"o_orderkey")
  }

  private val fnBitwiseSql = """
    SELECT o_orderkey,
      o_orderkey & o_custkey AS b_and,
      o_orderkey | o_custkey AS b_or,
      xor(o_orderkey, o_custkey) AS b_xor,
      ~o_orderkey AS b_not,
      CAST(o_custkey << 3 AS BIGINT) AS b_shl,
      CAST(o_orderkey >> 2 AS BIGINT) AS b_shr,
      CAST(bit_count(o_orderkey) AS BIGINT) AS b_cnt
    FROM orders ORDER BY o_orderkey"""

  /** q_fn_regex — the regex scalar family over document text:
    * rlike / regexp_count / regexp_replace / regexp_extract /
    * split-cardinality. Patterns stay in the POSIX-simple
    * Java∩RE2 intersection (ASCII classes, \b, alternation,
    * bounded quantifiers) — the rule the module header pins — so
    * both engines' regex dialects agree. Engine deltas handled:
    * Spark's regexp_replace is replace-ALL, DuckDB's default is
    * first-match ⇒ the oracle passes the 'g' flag; DuckDB counts
    * via len(regexp_extract_all). All codegen'd expressions —
    * per-row map work, no shuffle. */
  private def fnRegex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        $"text".rlike("scan (fast|slow)").as("rx_like"),
        regexp_count($"text", lit("\\btable\\b")).as("rx_count"),
        substring(regexp_replace($"text", "\\bthe\\b", "THE"), 1, 60)
          .as("rx_replace"),
        regexp_extract($"text", "\\b(s[a-z]+)\\b", 1).as("rx_first"),
        size(split($"text", " ")).as("rx_ntok"))
      .orderBy($"doc_id")
  }

  private val fnRegexSql = """
    SELECT doc_id,
      regexp_matches(text, 'scan (fast|slow)') AS rx_like,
      CAST(len(regexp_extract_all(text, '\btable\b')) AS INT)
        AS rx_count,
      substring(regexp_replace(text, '\bthe\b', 'THE', 'g'), 1, 60)
        AS rx_replace,
      regexp_extract(text, '\b(s[a-z]+)\b', 1) AS rx_first,
      CAST(len(string_split(text, ' ')) AS INT) AS rx_ntok
    FROM documents ORDER BY doc_id"""

  /** q_fn_interval — interval arithmetic on event-time: timestamp ±
    * INTERVAL literals, month addition with day-of-month clamping
    * (Jan 31 + 1 month = Feb 28/29 in both engines), and the
    * millisecond-epoch round-trip. All map-side codegen'd expressions.
    *
    * Dialect notes: the µs-precision event ts is truncated to µs in the
    * oracle first (DuckDB reads the ns parquet as TIMESTAMP_NS);
    * add_months returns DATE in Spark, so the oracle casts its
    * `+ INTERVAL n MONTH` result back to DATE; unix_millis floors to
    * the millisecond exactly like DuckDB's epoch_ms on post-epoch
    * values. */
  private def fnInterval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_id",
        tsOut($"ts" + expr("INTERVAL 36 HOURS")).as("plus_36h"),
        tsOut($"ts" - expr("INTERVAL 90 MINUTES")).as("minus_90m"),
        add_months(to_date($"ts"), 3).as("plus_3mo"),
        add_months(to_date($"ts"), -1).as("minus_1mo"),
        unix_millis($"ts").as("epoch_ms"),
        tsOut(timestamp_millis(unix_millis($"ts"))).as("roundtrip_ms"))
      .orderBy($"event_id")
  }

  private val fnIntervalSql = """
    WITH e AS (SELECT event_id,
                 date_trunc('microseconds', ts) AS t FROM events)
    SELECT event_id,
      t + INTERVAL 36 HOUR AS plus_36h,
      t - INTERVAL 90 MINUTE AS minus_90m,
      CAST(CAST(t AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3mo,
      CAST(CAST(t AS DATE) - INTERVAL 1 MONTH AS DATE) AS minus_1mo,
      epoch_ms(t) AS epoch_ms,
      make_timestamp(epoch_ms(t) * 1000) AS roundtrip_ms
    FROM e ORDER BY event_id"""

  /** q_fn_try — error-safe expression family (ANSI `TRY_`): a bad cell
    * yields NULL instead of failing the job. The 100 TB argument IS the
    * semantics: one malformed row in a petabyte scan must not kill the
    * query (the row-level twin of q_source_corrupt's file-level
    * quarantine). try_cast on a non-numeric string, try_mod hitting a
    * genuine zero modulus (props.k = 0 rows exist in the fixture), and
    * try_add at the bigint overflow boundary — all codegen'd, map-side.
    * (try_divide is deliberately NOT the witness: double division by
    * zero is IEEE Infinity, not an error, so its try_ form never
    * fires; the integer modulus is the honest error site.)
    *
    * Dialect notes: DuckDB has TRY_CAST but no try_mod/try_add, so the
    * oracle spells those as CASE guards with the same NULL semantics;
    * everything compared is integer-exact. */
  private def fnTry(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .withColumn("k",
        expr("try_cast(get_json_object(props, '$.k') AS BIGINT)"))
      .select($"event_id", $"k",
        expr("try_cast(event_type AS BIGINT)").as("bad_int"),
        expr("try_mod(event_id, k)").as("safe_mod"),
        expr("try_add(9223372036854775807L, event_id)").as("overflowed"),
        expr("try_cast(event_type AS DATE)").as("bad_date"))
      .orderBy($"event_id")
  }

  private val fnTrySql = """
    WITH e AS (SELECT event_id, event_type,
                 TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                   AS k
               FROM events)
    SELECT event_id, k,
      TRY_CAST(event_type AS BIGINT) AS bad_int,
      CASE WHEN k = 0 THEN NULL
           ELSE event_id % k END AS safe_mod,
      CASE WHEN event_id > 0 THEN NULL
           ELSE CAST(9223372036854775807 + event_id AS BIGINT)
           END AS overflowed,
      TRY_CAST(event_type AS DATE) AS bad_date
    FROM e ORDER BY event_id"""

  /** q_fn_url — URL parsing family (the reference lineage ships
    * PARSE_URL in its Table API function library [B]; web-corpus
    * pipelines normalize/split URLs constantly). Deterministic URLs are
    * synthesized from document attributes, then decomposed with
    * `parse_url` (protocol/host/path/query/fragment + one query param).
    * DuckDB has no parse_url, so the oracle specifies the identical
    * semantics as anchored regexes — which doubles as a precise spec of
    * the components; all map-side codegen. */
  private def fnUrl(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("url",
        concat(lit("https://"), $"source", lit(".example.org/docs/"),
          $"doc_id", lit("?lang="), $"lang", lit("&page=2#s1")))
      .select($"doc_id", $"url",
        expr("parse_url(url, 'PROTOCOL')").as("u_proto"),
        expr("parse_url(url, 'HOST')").as("u_host"),
        expr("parse_url(url, 'PATH')").as("u_path"),
        expr("parse_url(url, 'QUERY')").as("u_query"),
        expr("parse_url(url, 'REF')").as("u_frag"),
        expr("parse_url(url, 'QUERY', 'lang')").as("u_lang"))
      .orderBy($"doc_id")
  }

  private val fnUrlSql = """
    WITH d AS (SELECT doc_id,
                 'https://' || source || '.example.org/docs/' || doc_id
                   || '?lang=' || lang || '&page=2#s1' AS url
               FROM documents)
    SELECT doc_id, url,
      regexp_extract(url, '^([a-z]+):', 1) AS u_proto,
      regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS u_host,
      regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS u_path,
      regexp_extract(url, '\?([^#]*)', 1) AS u_query,
      regexp_extract(url, '#(.*)$', 1) AS u_frag,
      regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS u_lang
    FROM d ORDER BY doc_id"""

  /** q_fn_lambda — higher-order (lambda) array functions over the
    * embedding column: predicate forms `filter`/`exists`/`forall` and
    * the binary-zip `zip_with`, complementing q_fn_array's
    * transform/aggregate pair. These run INSIDE codegen as loops over
    * the array — no explode, no shuffle, no UDF serialization: the
    * per-row array never leaves the task, which is what makes
    * vector-column feature engineering affordable at 100 TB. The
    * zip_with fold casts each float to double BEFORE multiplying and
    * folds left-to-right — a fixed IEEE tree, so the 4-dp round is
    * belt-and-suspenders, not a mask. */
  private def fnLambda(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = $"embedding"
    Tables.embeddings(spark, dir)
      .select($"vec_id",
        size(filter(emb, x => x > lit(0.0f))).as("n_pos"),
        exists(emb, x => abs(x) > lit(2.0f)).as("any_big"),
        forall(emb, x => abs(x) < lit(8.0f)).as("all_small"),
        round(aggregate(
          zip_with(emb, reverse(emb),
            (a, b) => a.cast("double") * b.cast("double")),
          lit(0.0d), (acc, x) => acc + x), 4).as("dot_rev"))
      .orderBy($"vec_id")
  }

  private val fnLambdaSql = """
    SELECT vec_id,
      len(list_filter(embedding, x -> x > 0)) AS n_pos,
      len(list_filter(embedding, x -> abs(x) > 2)) > 0 AS any_big,
      len(list_filter(embedding, x -> NOT (abs(x) < 8))) = 0 AS all_small,
      round(list_reduce(
        list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(list_zip(embedding, list_reverse(embedding)),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))),
        (acc, x) -> acc + x), 4) AS dot_rev
    FROM embeddings ORDER BY vec_id"""

  /** q_fn_hash — hashing / binary-encoding scalar family: md5, sha256,
    * base64 and hex with their decode round-trips. Content hashing is
    * the backbone of exact dedup, shard assignment and cache keys in a
    * corpus pipeline; the round-trips pin that both engines agree on
    * the byte-level encoding (UTF-8 in, same digest/base64/hex out),
    * not just on a string's happy path. All map-side codegen. */
  private def fnHash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val b = $"n_name".cast("binary")
    Tables.nation(spark, dir)
      .select($"n_nationkey",
        md5(b).as("h_md5"),
        sha2(b, 256).as("h_sha256"),
        base64(b).as("h_b64"),
        decode(unbase64(base64(b)), "UTF-8").as("h_b64_rt"),
        lower(hex($"n_name")).as("h_hex"),
        decode(unhex(lower(hex($"n_name"))), "UTF-8").as("h_hex_rt"))
      .orderBy($"n_nationkey")
  }

  private val fnHashSql = """
    SELECT n_nationkey,
      md5(n_name) AS h_md5,
      sha256(n_name) AS h_sha256,
      to_base64(encode(n_name)) AS h_b64,
      decode(from_base64(to_base64(encode(n_name)))) AS h_b64_rt,
      lower(hex(n_name)) AS h_hex,
      decode(unhex(lower(hex(n_name)))) AS h_hex_rt
    FROM nation ORDER BY n_nationkey"""

  /** q_fn_variant — the VARIANT semi-structured type (Spark 4's
    * open-lakehouse JSON encoding): parse once into the binary variant
    * form, then typed path extraction. Versus q_fn_json's per-call
    * string re-parse, a variant column is parsed ONCE at ingest and
    * every downstream `variant_get` is a binary-offset walk — the
    * difference between O(fields × queries) and O(1) parses per row at
    * 100 TB. Declared outputs are scalars (typed gets + a try_ miss);
    * the oracle spells the same accesses as DuckDB JSON extraction. */
  private def fnVariant(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v = parse_json($"props")
    Tables.events(spark, dir)
      .select($"event_id",
        variant_get(v, "$.k", "bigint").as("v_k"),
        variant_get(v, "$.k", "string").as("v_k_str"),
        try_variant_get(v, "$.missing", "bigint").as("v_missing"),
        is_variant_null(try_parse_json(lit("null"))).as("v_null_lit"))
      .orderBy($"event_id")
  }

  private val fnVariantSql = """
    SELECT event_id,
      CAST(json_extract_string(props, '$.k') AS BIGINT) AS v_k,
      json_extract_string(props, '$.k') AS v_k_str,
      CAST(NULL AS BIGINT) AS v_missing,
      TRUE AS v_null_lit
    FROM events ORDER BY event_id"""

  /** q_fn_collation — Spark 4 COLLATION support (SPARK-46830: collated
    * string types flow through comparisons, grouping and shuffles):
    * grouping under `UTF8_LCASE` collapses case variants that binary
    * equality keeps apart. The witness doubles `nation` with a
    * case-mangled twin (initcap of lower) and groups by the collated
    * name — 25×2 surface forms → 25 ci-groups, each holding 2
    * binary-distinct members; the group representative is min() over
    * the BINARY (non-collated) copy so the output never depends on
    * which form the hash saw first. The point at scale: collation is
    * honored INSIDE the hash shuffle (ci-equal keys land on one
    * partition), not by a post-hoc lower() projection — though the
    * oracle derives the same groups independently via lower(). */
  private def fnCollation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nation = Tables.nation(spark, dir)
    val doubled = nation.select($"n_name")
      .unionAll(nation.select(initcap(lower($"n_name")).as("n_name")))
    doubled
      .groupBy(collate($"n_name", "UTF8_LCASE").as("k"))
      .agg(min($"n_name".cast("string")).as("name_rep"),
        count(lit(1)).as("n_forms"),
        countDistinct($"n_name".cast("string")).as("n_bin_distinct"))
      .select($"name_rep", $"n_forms", $"n_bin_distinct",
        contains(collate($"name_rep", "UTF8_LCASE"),
          collate(lit("An"), "UTF8_LCASE")).as("has_an_ci"))
      .orderBy($"name_rep")
  }

  private val fnCollationSql = """
    WITH d AS (
      SELECT n_name FROM nation
      UNION ALL
      SELECT upper(n_name[1]) || lower(n_name[2:]) FROM nation)
    SELECT min(n_name) AS name_rep, count(*) AS n_forms,
      count(DISTINCT n_name) AS n_bin_distinct,
      contains(lower(min(n_name)), 'an') AS has_an_ci
    FROM d GROUP BY lower(n_name) ORDER BY name_rep"""

  /** q_fn_aes — AES column encryption round-trip (`aes_encrypt` /
    * `aes_decrypt`, the PII-at-rest surface for sensitive columns).
    * ECB/PKCS is the deterministic mode (GCM salts a random IV per
    * call, which would make the ciphertext unoracleable), so the
    * witness pins (a) plaintext survives the round trip byte-exactly
    * and (b) the ciphertext length follows the PKCS#7 block formula
    * 16·(⌊len/16⌋+1) — DuckDB has no AES, so the oracle derives both
    * from the plaintext alone, which is exactly what makes them
    * engine-checkable. Both directions are codegen'd scalar calls,
    * map-side only. */
  private def fnAes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val key = lit("0123456789abcdef").cast("binary")
    val ct = aes_encrypt($"n_name".cast("binary"), key, lit("ECB"))
    Tables.nation(spark, dir)
      .select($"n_nationkey",
        aes_decrypt(ct, key, lit("ECB")).cast("string").as("rt"),
        length(ct).cast("long").as("ct_len"),
        (aes_decrypt(ct, key, lit("ECB")).cast("string") === $"n_name")
          .as("rt_ok"))
      .orderBy($"n_nationkey")
  }

  private val fnAesSql = """
    SELECT n_nationkey, n_name AS rt,
      CAST(16 * (length(n_name) // 16 + 1) AS BIGINT) AS ct_len,
      TRUE AS rt_ok
    FROM nation ORDER BY n_nationkey"""

  /** q_fn_xpath — XPath scalar extraction family (`xpath_string` /
    * `xpath_long` / `xpath(...)` node-set, the Hive-compat XML scalar
    * surface complementing q_source_xml's format roundtrip). The XML
    * is synthesized per row from safe columns (uppercase name words →
    * one <t> element each), so the oracle derives every output
    * INDEPENDENTLY from the synthesis inputs — a parser bug cannot
    * cancel out. All map-side; xpath compiles the path once per
    * expression, per-row work is the document walk. */
  private def fnXpath(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val x = concat(lit("<r><n>"), $"n_name", lit("</n><k>"),
      $"n_nationkey".cast("string"), lit("</k><tags><t>"),
      regexp_replace($"n_name", " ", "</t><t>"), lit("</t></tags></r>"))
    Tables.nation(spark, dir)
      .withColumn("x", x)
      .select($"n_nationkey",
        expr("xpath_string(x, '/r/n')").as("x_name"),
        expr("xpath_long(x, '/r/k')").as("x_key"),
        size(expr("xpath(x, '/r/tags/t/text()')")).as("n_tags"),
        expr("xpath_string(x, '/r/tags/t[1]')").as("first_tag"))
      .orderBy($"n_nationkey")
  }

  private val fnXpathSql = """
    SELECT n_nationkey, n_name AS x_name, n_nationkey AS x_key,
      CAST(length(string_split(n_name, ' ')) AS INT) AS n_tags,
      string_split(n_name, ' ')[1] AS first_tag
    FROM nation ORDER BY n_nationkey"""

  /** q_fn_csv — scalar CSV codec (`to_csv` / `from_csv`), the per-cell
    * twin of the q_source_csv format roundtrip: serialize a struct to
    * one CSV line, parse it back under an explicit schema. The
    * injected ", Inc." suffix forces RFC 4180 quoting through the
    * round trip, and the double survives bit-exactly via shortest-repr
    * formatting (the jsonl_gz precedent). This is the shape of
    * embedded-CSV payloads inside another table (log lines, message
    * envelopes) — parsed per row, map-side, no source involved. */
  private def fnCsv(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val line = to_csv(struct(
      $"s_suppkey",
      concat($"s_name", lit(", Inc.")).as("corp"),
      $"s_acctbal"))
    val parsed = from_csv(line,
      org.apache.spark.sql.types.StructType.fromDDL(
        "s_suppkey BIGINT, corp STRING, s_acctbal DOUBLE"),
      Map.empty[String, String])
    Tables.supplier(spark, dir)
      .select($"s_suppkey", $"s_name", $"s_acctbal", parsed.as("p"))
      .select($"s_suppkey",
        $"p.corp".as("corp"),
        $"p.s_acctbal".as("bal_rt"),
        ($"p.s_suppkey" === $"s_suppkey" &&
          $"p.s_acctbal" === $"s_acctbal" &&
          $"p.corp" === concat($"s_name", lit(", Inc."))).as("rt_ok"))
      .orderBy($"s_suppkey")
  }

  private val fnCsvSql = """
    SELECT s_suppkey, s_name || ', Inc.' AS corp, s_acctbal AS bal_rt,
      TRUE AS rt_ok
    FROM supplier ORDER BY s_suppkey"""

  /** q_fn_editdist — edit-distance scalar family (fuzzy matching /
    * record-linkage primitive): plain Levenshtein between two string
    * columns, the THRESHOLD-bounded form (Spark 3.5+ bails out of the
    * DP early and returns −1 past the bound — the form to use in a
    * 100 TB similarity filter, O(threshold·len) instead of
    * O(len²)), and the empty-string edge (distance = other length).
    * Pure per-row codegen, no shuffle; the oracle spells the bounded
    * form as CASE over DuckDB's unbounded levenshtein. */
  private def fnEditdist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .select($"p_partkey",
        levenshtein($"p_name", $"p_type").cast("bigint").as("lev_nt"),
        levenshtein($"p_name", $"p_type", 12).cast("bigint")
          .as("lev_nt_cap"),
        levenshtein($"p_brand", $"p_type").cast("bigint")
          .as("lev_bt"),
        levenshtein(lit(""), $"p_brand").cast("bigint").as("lev_empty"))
      .orderBy($"p_partkey")
  }

  private val fnEditdistSql = """
    SELECT p_partkey,
      CAST(levenshtein(p_name, p_type) AS BIGINT) AS lev_nt,
      CAST(CASE WHEN levenshtein(p_name, p_type) > 12 THEN -1
        ELSE levenshtein(p_name, p_type) END AS BIGINT) AS lev_nt_cap,
      CAST(levenshtein(p_brand, p_type) AS BIGINT) AS lev_bt,
      CAST(levenshtein('', p_brand) AS BIGINT) AS lev_empty
    FROM part ORDER BY p_partkey"""

  /** q_fn_format — printf-style formatting family (report/export
    * surface): `format_string` with %s / zero-padded %05d / hex %x
    * conversions, ascii↔chr round-trip, and `repeat`. Integer-only
    * conversions on purpose: Java's Formatter rounds %f ties HALF_UP
    * while C printf (DuckDB) rounds half-even, so float conversions are
    * the one cross-engine trap in this family — documented here,
    * excluded from the witness. Pure per-row codegen. */
  private def fnFormat(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.supplier(spark, dir)
      .select($"s_suppkey",
        format_string("%s-%05d", $"s_name", $"s_suppkey").as("tag"),
        format_string("%x", $"s_suppkey").as("hexkey"),
        ascii($"s_name").cast("bigint").as("first_code"),
        concat(expr("char(ascii(s_name))"), lit(":"), $"s_name")
          .as("chr_roundtrip"),
        repeat(lit("#"), (pmod($"s_suppkey", lit(5)) + 1).cast("int"))
          .as("bar"))
      .orderBy($"s_suppkey")
  }

  private val fnFormatSql = """
    SELECT s_suppkey,
      printf('%s-%05d', s_name, s_suppkey) AS tag,
      printf('%x', s_suppkey) AS hexkey,
      CAST(ascii(s_name) AS BIGINT) AS first_code,
      chr(ascii(s_name)) || ':' || s_name AS chr_roundtrip,
      repeat('#', CAST(s_suppkey % 5 + 1 AS INT)) AS bar
    FROM supplier ORDER BY s_suppkey"""

  /** q_fn_mask — character-class masking (`mask()`, Spark 3.5+): the
    * schema-level PII-masking surface next to q_llm_redact's denylist
    * scrubbing — upper→X, lower→x, digit→n by default, plus a
    * fully-overridden variant (incl. the other-char class). Per-row
    * codegen, no shuffle; the oracle spells each class as a chained
    * global regexp_replace, other-class LAST so the replacement
    * characters themselves are never re-masked. */
  private def fnMask(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .select($"c_custkey",
        mask($"c_name").as("m_name"),
        mask($"c_mktsegment").as("m_seg"),
        mask($"c_name", lit("U"), lit("l"), lit("9"), lit("?"))
          .as("m_custom"))
      .orderBy($"c_custkey")
  }

  private val fnMaskSql = """
    SELECT c_custkey,
      regexp_replace(regexp_replace(regexp_replace(c_name,
        '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
        AS m_name,
      regexp_replace(regexp_replace(regexp_replace(c_mktsegment,
        '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
        AS m_seg,
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        c_name,
        '[A-Z]', 'U', 'g'), '[a-z]', 'l', 'g'), '[0-9]', '9', 'g'),
        '[^Ul9]', '?', 'g') AS m_custom
    FROM customer ORDER BY c_custkey"""

  val all: Seq[Q] = Seq(
    Q("q_fn_mask", fnMask _, fnMaskSql),
    Q("q_fn_format", fnFormat _, fnFormatSql),
    Q("q_fn_editdist", fnEditdist _, fnEditdistSql),
    Q("q_fn_collation", fnCollation _, fnCollationSql),
    Q("q_fn_aes", fnAes _, fnAesSql),
    Q("q_fn_xpath", fnXpath _, fnXpathSql),
    Q("q_fn_csv", fnCsv _, fnCsvSql),
    Q("q_fn_lambda", fnLambda _, fnLambdaSql),
    Q("q_fn_hash", fnHash _, fnHashSql),
    Q("q_fn_variant", fnVariant _, fnVariantSql),
    Q("q_fn_url", fnUrl _, fnUrlSql),
    Q("q_fn_try", fnTry _, fnTrySql),
    Q("q_fn_interval", fnInterval _, fnIntervalSql),
    Q("q_fn_regex", fnRegex _, fnRegexSql),
    Q("q_fn_struct", fnStruct _, fnStructSql),
    Q("q_fn_bitwise", fnBitwise _, fnBitwiseSql),
    Q("q_fn_string", fnString _, fnStringSql),
    Q("q_fn_date", fnDate _, fnDateSql),
    Q("q_fn_math", fnMath _, fnMathSql),
    Q("q_fn_cond", fnCond _, fnCondSql),
    Q("q_fn_array", fnArray _, fnArraySql),
    Q("q_fn_map", fnMap _, fnMapSql),
    Q("q_fn_json", fnJson _, fnJsonSql))
}
