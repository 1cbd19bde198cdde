package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions — the "would this survive 100x scale"
  * checks: filters must reach the parquet scan, small dims must
  * broadcast, scans must read only referenced columns. */
class PlanSpec extends AnyFunSuite {
  import TestSession._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  /** Executed plan with AQE off: ShuffleExchangeExec nodes are inserted
    * by EnsureRequirements into the EXECUTED plan only (sparkPlan never
    * has them, so asserting on it is vacuous), and with AQE on the whole
    * query hides inside an AdaptiveSparkPlanExec leaf whenever it
    * contains an exchange — exactly the case shuffle assertions exist to
    * catch. */
  private def nonAdaptivePlan(name: String): org.apache.spark.sql.execution.SparkPlan = {
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("q1 pushes the shipdate filter into the parquet scan") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("q1 scan reads only the referenced columns") {
    val p = plan("q1_agg")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), readSchema)
    assert(readSchema.contains("l_returnflag"), readSchema)
  }

  test("q5 star join broadcasts the small dimensions") {
    val p = plan("q5_multijoin")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q3 topN compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan("q3_join_topn")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q6 aggregates in two phases (partial + final)") {
    val p = plan("q6_filter_agg")
    assert(p.contains("HashAggregate"), p.take(2000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, "no partial aggregation")
  }

  test("whole-stage codegen covers the hot paths") {
    // AQE materializes codegen stages lazily — execute, then inspect
    def executedPlanOf(name: String): String = {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    // Spark 4 prints codegen stages as "*(n) Operator"
    val p1 = executedPlanOf("q1_agg")
    assert(p1.contains("*(1) Filter") && p1.contains("*(1) HashAggregate"), p1.take(1500))
    // q40 is pure scalar expressions — must stay in one codegen stage.
    // (q61's stopword ratio uses a higher-order `filter` lambda, which is
    // CodegenFallback in Spark — a known, accepted fallback there.)
    val p40 = executedPlanOf("q40_string_funcs")
    assert(p40.linesIterator.exists(l => l.contains("*(") && l.contains("Project")), p40.take(1500))
  }

  test("SQL join-strategy hints steer the planner (MAPJOIN/STREAMTABLE hint surface)") {
    // the reference's /*+ MAPJOIN(t) */ parser hint (ql HintParser ->
    // MapJoinProcessor) maps onto Spark's per-join strategy hints; all
    // three strategies must be reachable from plain SQL
    Tables.orders(spark, sf).createOrReplaceTempView("hint_orders")
    Tables.customer(spark, sf).createOrReplaceTempView("hint_cust")
    def planOf(hint: String) = spark.sql(
      s"SELECT /*+ $hint */ c.c_name, o.o_totalprice FROM hint_orders o " +
        "JOIN hint_cust c ON o.o_custkey = c.c_custkey")
      .queryExecution.executedPlan.toString
    assert(planOf("BROADCAST(c)").contains("BroadcastHashJoin"))
    assert(planOf("MERGE(c)").contains("SortMergeJoin"))
    assert(planOf("SHUFFLE_HASH(c)").contains("ShuffledHashJoin"))
  }

  test("q194 merge hint really produces a sort-merge join; q195 salted join stays equi") {
    val p194 = plan("q194_sortmerge_join")
    assert(p194.contains("SortMergeJoin"), p194.take(1500))
    assert(!p194.contains("BroadcastHashJoin"), "hint('merge') was ignored")
    val p195 = plan("q195_salted_skew_join")
    assert(!p195.contains("CartesianProduct") && !p195.contains("BroadcastNestedLoopJoin"),
      "salted join must remain an equi-join")
  }

  test("q198 rarity join broadcasts the vocab sliver, never shuffles the token stream") {
    val p = plan("q198_token_rarity")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      p.take(1500))
    // the only hash-shuffles allowed are the two keyed aggregations
    // (vocab count + per-doc rollup) — the token->vocab JOIN must not
    // add a third repartitioning of the exploded token stream
    val joinShuffles = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).size
    assert(joinShuffles <= 2, s"unexpected extra shuffle:\n${p.take(2000)}")
  }

  test("q118 EXISTS/NOT EXISTS self-joins rewrite to semi/anti joins") {
    val p = plan("q118_waiting_supplier")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("SemiJoin") || p.contains("LeftSemi"), p.take(2000))
    assert(p.contains("AntiJoin") || p.contains("LeftAnti"), p.take(2000))
  }

  test("rank-filter dedup pushes a partial group-limit below the shuffle") {
    // row_number()=1 dedup (q23) must plan as WindowGroupLimit with a
    // Partial mode BEFORE the exchange — Spark's built-in TopNHash
    // analog; this is why the engine does NOT ship a custom group-top-k
    // operator (the built-in already prunes map-side at scale)
    val p = plan("q23_window_dedup")
    assert(p.contains("WindowGroupLimit"), p.take(3000))
    assert(p.contains("Partial"), p.take(3000))
  }

  test("EXPLAIN statement forms work (ExplainTask surface)") {
    Tables.registerAll(spark, sf)
    val basic = spark.sql("EXPLAIN SELECT count(1) FROM lineitem WHERE l_quantity > 10")
      .collect()(0).getString(0)
    assert(basic.contains("Physical Plan"), basic.take(300))
    val ext = spark.sql("EXPLAIN EXTENDED SELECT 1").collect()(0).getString(0)
    assert(ext.contains("Parsed Logical Plan") && ext.contains("Optimized Logical Plan"))
    val fmt = spark.sql(
      "EXPLAIN FORMATTED SELECT l_returnflag, sum(l_quantity) FROM lineitem GROUP BY 1")
      .collect()(0).getString(0)
    assert(fmt.contains("HashAggregate"), fmt.take(500))
  }

  test("brute-force topk broadcasts the query vectors, not the corpus") {
    val p = plan("q68_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q132 running sum is a bounded two-pass prefix sum, not a per-source window") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val p = SparkEntry.queries("q132_token_packing")(spark, sf).queryExecution.sparkPlan
    val wins = p.collect { case w: WindowExec => w }
    assert(wins.nonEmpty, "expected window operators in q132")
    // the full-data window must partition on (source, chunk): every window
    // partition is a bounded doc_id slice, never a whole source
    assert(wins.exists(_.partitionSpec.size >= 2),
      wins.map(_.partitionSpec.mkString("[", ",", "]")).mkString("; "))
    // a window partitioned on a single column is only allowed over the
    // aggregated per-chunk subtotal table (metadata-sized), never raw docs
    wins.filter(_.partitionSpec.size < 2).foreach { w =>
      assert(w.collect { case a: BaseAggregateExec => a }.nonEmpty,
        s"single-key window over un-aggregated data: partitionSpec=${w.partitionSpec}")
    }
  }

  test("q135 rank sort sees only the hash-pre-filtered sliver of each stratum") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val p = SparkEntry.queries("q135_stratified_sample")(spark, sf).queryExecution.sparkPlan
    val wins = p.collect { case w: WindowExec => w }
    assert(wins.nonEmpty, "expected window operators in q135")
    def isPrefilter(s: String) = s.contains("hkey") && s.contains("cutoff")
    wins.foreach { w =>
      // Catalyst folds the hkey<cutoff predicate into the broadcast join
      // condition when it can; accept either placement
      val pref = w.collect {
        case f: FilterExec if isPrefilter(f.condition.toString) => f
        case j: BroadcastHashJoinExec if j.condition.exists(c => isPrefilter(c.toString)) => j
      }
      assert(pref.nonEmpty,
        s"stratum window without the hkey<cutoff pre-filter below it: ${w.partitionSpec}")
    }
  }

  test("q146 chunking is shuffle-free below the presentation sort") {
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val p = nonAdaptivePlan("q146_doc_chunking")
    // the only exchange allowed is the range partitioning for ORDER BY;
    // tokenize/explode/slice must all run scan-side
    val shuffles = p.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size == 1, s"expected exactly the ORDER BY exchange: ${shuffles.size}")
    shuffles.foreach { e =>
      assert(e.outputPartitioning.toString.toLowerCase.contains("range"),
        s"non-sort exchange in chunk pipeline: ${e.outputPartitioning}")
    }
    assert(p.collect { case s: SortExec => s }.nonEmpty)
  }

  test("q147 training-order rank sees only the hash-pre-filtered sliver per shard") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val p = SparkEntry.queries("q147_training_order")(spark, sf).queryExecution.sparkPlan
    val wins = p.collect { case w: WindowExec => w }
    assert(wins.nonEmpty, "expected window operators in q147")
    def isPrefilter(s: String) = s.contains("hkey") && s.contains("cutoff")
    wins.foreach { w =>
      val pref = w.collect {
        case f: FilterExec if isPrefilter(f.condition.toString) => f
        case j: BroadcastHashJoinExec if j.condition.exists(c => isPrefilter(c.toString)) => j
      }
      assert(pref.nonEmpty,
        s"shard window without the hkey<cutoff pre-filter below it: ${w.partitionSpec}")
    }
  }

  test("q149 bucketed join reads shuffle-free below the final aggregate") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    val p = nonAdaptivePlan("q149_smb_join")
    // both sides are bucketed+sorted on the join key: NOTHING inside the
    // join's subtree may be an exchange (exchanges above the 3-row
    // aggregate are the ORDER BY's business)
    val joins = p.collect {
      case j: SortMergeJoinExec => j
      case j: ShuffledHashJoinExec => j
      case j: BroadcastHashJoinExec => j
    }
    val factJoin = joins.find(_.toString.contains("lineitem_smb"))
    assert(factJoin.isDefined, s"no join over the bucketed tables found:\n$p")
    val inJoin = factJoin.get.collect { case e: ShuffleExchangeExec => e }
    assert(inJoin.isEmpty, s"bucketed join shuffled fact rows:\n${factJoin.get}")
  }

  test("q150 partitioned read prunes to the filtered partition") {
    val p = SparkEntry.queries("q150_partitioned_sink")(spark, sf)
      .queryExecution.executedPlan.toString
    val scanLine = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("o_orderstatus"),
      s"expected a partition filter on o_orderstatus: $scanLine")
  }

  test("q148 decontamination broadcasts the eval shingle set; train side never shuffles pre-agg") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    val p = SparkEntry.queries("q148_decontamination")(spark, sf).queryExecution.sparkPlan
    assert(p.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
      "eval shingles must broadcast")
    assert(p.collect { case j: SortMergeJoinExec => j }.isEmpty,
      "a sort-merge join here means the train side shuffled on shingle")
  }

  test("q178 BM25 never shuffles the corpus: stats broadcast + scan-side scoring") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val p = SparkEntry.queries("q178_bm25")(spark, sf).queryExecution.sparkPlan
    // allowed exchanges: the singleton stats aggregate's partial->final
    // hop and the terminal presentation sort — NOT a shuffle of the
    // scored corpus keyed on anything
    val shuffles = p.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 2,
      s"q178 planned ${shuffles.size} shuffles — corpus-side shuffle crept in:\n$p")
    assert(p.toString.contains("BroadcastNestedLoopJoin") ||
           p.toString.contains("BroadcastExchange"),
      "the 1-row stats must broadcast, not co-partition")
  }

  test("q183 char entropy is a pure projection: ordering is its only exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec}
    val p = SparkEntry.queries("q183_char_entropy")(spark, sf).queryExecution.sparkPlan
    assert(p.collect { case s: ShuffleExchangeExec => s }.size <= 1,
      s"q183 must only exchange for the presentation sort:\n$p")
    assert(p.collect { case a: HashAggregateExec => a
                       case a: ObjectHashAggregateExec => a }.isEmpty,
      "q183 has no aggregation — the 27 counts are scalar expressions")
  }

  test("q179 quantized cells is one map-combinable aggregation over the scan") {
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec}
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    val p = SparkEntry.queries("q179_quantized_cells")(spark, sf).queryExecution.sparkPlan
    val aggs = p.collect { case a: HashAggregateExec => a
                           case a: ObjectHashAggregateExec => a }
    assert(aggs.size >= 2, "cell aggregation must run partial->final (map-side combine)")
    assert(p.collect { case j: SortMergeJoinExec => j
                       case j: BroadcastHashJoinExec => j }.isEmpty,
      "q179 joins nothing — cells come straight off the scan")
  }
}
