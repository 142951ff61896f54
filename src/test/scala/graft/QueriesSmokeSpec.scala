package graft

/** Every declared query must run on sf0.001 without throwing — a query
  * that throws under graft.Verify silently drops out of the driver's
  * correctness score (SURVEY.md §0.1), so this is the guard. */
class QueriesSmokeSpec extends SparkSuite {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query has an oracle or is an allowed omission") {
    val omitted = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // q_stream_late / q_stream_late_side gained watermark-simulation
    // oracles in r22 and left this set.
    val allowed = Set("q_agg_approx_distinct", "q_agg_approx_quantile", "q_llm_dedup_near",
      "q_llm_simhash", "q_llm_simhash_pairs", "q_llm_knn_lsh",
      "q_llm_knn_ivf",
      "q_agg_sketch_theta", "q_agg_freq_items", "q_agg_sketch_algebra", "q_stream_sketch")
    assert(omitted == allowed)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      // SURVEY §2.12: no non-scalar column in a declared output. The
      // driver's pandas comparator sorts by EVERY column; an array/
      // struct/map cell makes that sort throw (unhashable ndarray —
      // the q_llm_quantize red row in CORRECTNESS_r06). Queries that
      // compute collections must serialize them (concat_ws/to_json).
      import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
      val nonScalar = df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => s"${f.name}: ${f.dataType.simpleString}"
      }
      assert(nonScalar.isEmpty,
        s"non-scalar declared output column(s): ${nonScalar.mkString(", ")}")
      // No wide-decimal declared output either: the driver's
      // decimal128 hash normalization diverges from DuckDB's past
      // precision 18 (CORRECTNESS_r16 — q_agg_ks/auc/corr_matrix were
      // red on exactly their DECIMAL(38,0) columns). DECIMAL(38)
      // carries stay INTERNAL; witnesses cross the boundary as digit
      // strings or rounded doubles.
      import org.apache.spark.sql.types.DecimalType
      val wideDec = df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[DecimalType] &&
          f.dataType.asInstanceOf[DecimalType].precision > 18 =>
          s"${f.name}: ${f.dataType.simpleString}"
      }
      assert(wideDec.isEmpty,
        s"decimal precision > 18 in declared output: ${wideDec.mkString(", ")}")
      df.count() // force full execution
    }
  }
}
