package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.compat.QTestReplay

/** Verbatim replay of the reference's own clientpositive test corpus
  * (ql/src/test/queries/clientpositive + committed .q.out outputs) — the
  * goal's own success criterion: "matches the reference's results on its
  * own test queries". graft.compat.QTestReplay re-executes every
  * statement a .q.out echoes and compares rendered rows; this spec pins
  * the discovered pass set so a regression in any replayed statement
  * fails CI.
  *
  * Scope and honesty:
  *  - In scope: the read-only half of the corpus over the harness's
  *    standard fixtures (src/src1/srcpart/alltypesorc) — 383 files with
  *    at least one binding statement. 294 replay byte-exact under the
  *    reference harness's Pacific zone (QTestDiscover; committed report
  *    QTEST_REPORT.txt). This spec pins the 290 that are additionally
  *    JVM-zone-independent (the suite JVM runs UTC; legacy ORC timestamp
  *    decoding and java.sql.Timestamp method dispatch follow the JVM
  *    zone): udf_reflect2, vector_coalesce, vector_decimal_cast,
  *    vectorization_10 are LA-JVM-only, replayed by the discovery main;
  *    script_pipe replays but is pinned out as timing-flaky (see the
  *    note at its list position) — 289 pinned here.
  *  - Statements checked: every echoed QUERY except EXPLAIN/DESCRIBE/
  *    SHOW (presentation surfaces). A value mismatch on LIMIT-without-
  *    ORDER-BY is tallied nondeterministic, not pass or fail (SQL leaves
  *    the row choice unspecified; the reference's is a MapReduce
  *    artifact).
  *  - The ~90 out-of-pass-set files fail for DOCUMENTED divergence
  *    categories, each visible in QTEST_REPORT.txt: Hive types floating
  *    literals DOUBLE where Spark types DECIMAL (udf_round/bround/when);
  *    char(n) casts blank-pad in Hive, not in Spark (udf_mask family's
  *    char column, char_comparison); Hive coerces boolean/timestamp to
  *    numeric in comparisons, Catalyst refuses (vectorization_1/2/...);
  *    rand(seed) PRNG and variance accumulation tails are engine
  *    artifacts; harness-environment outputs (current_user, version,
  *    hook echoes) are not query semantics; BLOCK__OFFSET virtual
  *    columns, forward CTE references, uniontype constructors and the
  *    EWAH wire format are reference-internal surfaces covered by their
  *    graft analogs elsewhere (q169, q85/q86, Reflect2Spec).
  */
class ClientPositiveReplaySpec extends AnyFunSuite {
  import TestSession._

  private val resultsDir = "/root/reference/ql/src/test/results/clientpositive"
  private val refData = "/root/reference/data/files"

  private lazy val replaySession = {
    assume(new java.io.File(resultsDir).isDirectory, "reference corpus not present")
    QTestReplay.compatSession(spark, refData)
  }

  private val pinned: Seq[String] = Seq(
    "add_jar_with_file_removed", "ambiguous_col", "ansi_sql_arithmetic", "auto_join0",
    "auto_join10", "auto_join11", "auto_join12", "auto_join13",
    "auto_join15", "auto_join16", "auto_join18", "auto_join18_multi_distinct",
    "auto_join20", "auto_join21", "auto_join22", "auto_join23",
    "auto_join27", "auto_join29", "auto_join30", "auto_join31",
    "auto_join33", "binary_constant", "cast_to_int", "cbo_input26",
    "cbo_rp_outer_join_ppr", "cbo_rp_udf_percentile", "cbo_rp_udf_percentile2", "char_cast",
    "char_comparison", "cluster", "constantPropagateForSubQuery", "constant_prop",
    "constant_prop_2", "constprog1", "correlationoptimizer1", "correlationoptimizer14",
    "correlationoptimizer15", "correlationoptimizer2", "correlationoptimizer3", "correlationoptimizer6",
    "correlationoptimizer7", "correlationoptimizer8", "current_date_timestamp", "date_comparison",
    "driverhook", "explode_null", "expr_cached", "float_equality",
    "fouter_join_ppr", "groupby2_limit", "groupby_neg_float", "groupby_resolution",
    "having", "identity_project_remove_skip", "infer_join_preds", "input",
    "input0", "input23", "input26", "input2_limit",
    "input4_limit", "input_limit", "input_part0", "input_part3",
    "input_part4", "input_part6", "input_part7", "input_part8",
    "input_part9", "interval_1", "interval_2", "interval_comparison",
    "join0", "join10", "join11", "join12",
    "join13", "join15", "join18", "join18_multi_distinct",
    "join20", "join21", "join23", "join40",
    "join_literals", "join_merge_multi_expressions", "lateral_view_ppd", "limit0",
    "limit_partition_metadataonly", "limit_pushdown", "limit_pushdown2", "limit_pushdown3",
    "literal_double", "literal_ints", "louter_join_ppr", "mapjoin1",
    "mapjoin_distinct", "mapjoin_filter_on_outerjoin", "mapjoin_mapjoin", "mapjoin_subquery",
    "metadataOnlyOptimizer", "noalias_subq1", "non_ascii_literal1", "nonblock_op_deduplicate",
    "null_cast", "nullgroup", "nullgroup2", "nullgroup4",
    "nullgroup4_multi_distinct", "num_op_type_conv", "offset_limit", "offset_limit_global_optimizer",
    "offset_limit_ppd_optimizer", "ops_comparison", "optimize_nullscan", "order",
    "order2", "outer_join_ppr", "parallel_join0", "parenthesis_star_by",
    "ppd1", "ppd2", "ppd_clusterby", "ppd_constant_where",
    "ppd_gby", "ppd_gby2", "ppd_gby_join", "ppd_join",
    "ppd_join2", "ppd_join3", "ppd_join_filter", "ppd_outer_join1",
    "ppd_outer_join2", "ppd_outer_join3", "ppd_outer_join4", "ppd_udf_case",
    "ppd_udtf", "ppd_union", "ppr_allchildsarenull", "ppr_pushdown3",
    "query_with_semi", "quote2", "reduce_deduplicate_extended", "regex_col",
    // script_pipe replays but is pinned OUT: its `USING 'head -n 1'`
    // script closes stdin after one line, and whether the feeder thread
    // hits the broken pipe before the task finishes is a timing race —
    // flaky under suite load (Hive swallows the same EPIPE; discovery
    // still covers the file on a quiet box)
    "router_join_ppr", "select_as_omitted", "select_dummy_source",
    "semicolon", "sort", "source", "stats_null_optimizer",
    "subq2", "subquery_alias", "subquery_notexists", "subquery_notexists_having",
    "subquery_unqual_corr_expr", "sum_expr_with_order", "timestamp", "timestamp_comparison",
    "timestamp_literal", "transform2", "type_cast_1", "type_conversions_1",
    "udaf_collect_set", "udaf_histogram_numeric", "udaf_percentile", "udf9",
    "udf_E", "udf_PI", "udf_abs", "udf_acos",
    "udf_array", "udf_array_contains", "udf_ascii", "udf_asin",
    "udf_atan", "udf_between", "udf_bin", "udf_bitwise_shiftleft",
    "udf_bitwise_shiftright", "udf_bitwise_shiftrightunsigned", "udf_case_column_pruning", "udf_cbrt",
    "udf_chr", "udf_concat", "udf_conv", "udf_cos",
    "udf_count", "udf_crc32", "udf_date_add", "udf_date_sub",
    "udf_decode", "udf_degrees", "udf_div", "udf_divide",
    "udf_elt", "udf_equal", "udf_factorial", "udf_find_in_set",
    "udf_greaterthan", "udf_greaterthanorequal", "udf_hash", "udf_hex",
    "udf_if", "udf_inline", "udf_instr", "udf_lessthan",
    "udf_lessthanorequal", "udf_levenshtein", "udf_like", "udf_locate",
    "udf_lower", "udf_lpad", "udf_map", "udf_md5",
    "udf_named_struct", "udf_negative", "udf_notequal", "udf_notop",
    "udf_nvl", "udf_parse_url", "udf_percentile", "udf_pmod",
    "udf_regexp", "udf_repeat", "udf_replace", "udf_rpad",
    "udf_sha1", "udf_sha2", "udf_sign", "udf_sin",
    "udf_soundex", "udf_space", "udf_split", "udf_struct",
    "udf_substring_index", "udf_tan", "udf_to_byte", "udf_to_double",
    "udf_to_float", "udf_to_long", "udf_to_short", "udf_unhex",
    "udf_weekofyear", "udf_xpath", "udf_xpath_boolean", "udf_xpath_double",
    "udf_xpath_float", "udf_xpath_int", "udf_xpath_long", "udf_xpath_short",
    "udtf_stack", "union11", "union13", "union14",
    "union15", "union16", "union2", "union20",
    "union23", "union26", "union35", "union36",
    "union5", "union7", "union8", "union9",
    "union_null", "union_ppr", "union_script", "union_type_chk",
    "varchar_cast", "varchar_comparison", "vector_elt", "vector_groupby_mapjoin",
    "vector_if_expr", "vector_left_outer_join", "vector_nvl", "vectorization_11",
    "vectorization_5", "vectorization_limit", "vectorization_nested_udf", "vectorization_offset_limit",
    "vectorization_pushdown", "vectorized_case", "vectorized_mapjoin", "vectorized_nested_mapjoin",
    "vectorized_shufflejoin", "vectorized_string_funcs"
  )

  test("every pinned clientpositive file replays byte-exact (sorted-multiset rows)") {
    val results = pinned.map(n => QTestReplay.replayFile(replaySession, s"$resultsDir/$n.q.out"))
    val bad = results.filterNot(_.passed)
    assert(bad.isEmpty, "regressed files:\n" + bad.map(r =>
      s"${r.file}: ${r.failures.mkString("; ")}").mkString("\n"))
    val checked = results.map(_.checked).sum
    assert(checked >= 880, s"binding-statement count collapsed: $checked — " +
      "a parser/skip-rule change is silently discarding statements")
  }
}
