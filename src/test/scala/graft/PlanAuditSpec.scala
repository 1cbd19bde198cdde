package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fleet-wide plan audit: every declared query must compile to a plan
  * that survives a 100x scale-up. Concretely: no CartesianProduct
  * anywhere, and nested-loop joins only where one side is a broadcast
  * constant by design. This is the automated version of reading
  * .explain output per operator. */
class PlanAuditSpec extends AnyFunSuite {
  import TestSession._

  /** Queries where a BroadcastNestedLoopJoin is the intended plan —
    * in each, the broadcast side is constant-small, not data-scaled. */
  private val bnljJustified = Map(
    "q49_stack" -> "3-row stack() constant table, non-equi band predicate",
    "q9_theta_join" -> "theta join is non-equi by definition; small side broadcast",
    "q67_ngram_jaccard" -> "deliberate all-pairs exact oracle path, capped at 1000 docs",
    "q68_cosine_topk" -> "brute-force baseline: broadcast 5-query set x corpus scan",
    "q231_label_noise" -> "kNN audit over brute force: broadcast bounded audit slice x corpus scan",
    "q87_ann_ivf" -> "corpus x broadcast(16 centroids) assignment pass",
    "q224_ann_pq" -> "PQ codes x broadcast(5-query ADC tables) lookup pass",
    "q256_ann_ivf_exact" -> "same assignment pass as q87, zero-iteration codebooks",
    "q257_ann_pq_exact" -> "same lookup pass as q224, zero-iteration codebooks",
    "q156_ds_scalar_lanes" -> "DS query88 shape: 1x1 cross joins of singleton aggregates",
    "q169_bitmap_index" -> "three singleton bitmap lanes cross-joined 1x1",
    "q170_ds_double_semi" -> "scalar spend threshold: 1x1 broadcast of a singleton max",
    "q171_ds_iceberg" -> "scalar average-price gate: 1x1 broadcast of a singleton agg",
    "q178_bm25" -> "corpus x broadcast(1-row N/avgdl/df stats) — BM25 scalar gate",
    "q182_tfidf_terms" -> "agg sliver x broadcast(1-row corpus doc count) — idf scalar gate",
    "q198_token_rarity" -> "vocab sliver x broadcast(1-row corpus token total) — rarity scalar gate",
    "q239_source_token_drift" -> "source-totals sliver x broadcast(top-100 token lattice) + 1-row corpus total",
    "q252_skew_report" -> "per-key-profile 1x1 cross join of a singleton agg with a broadcast 10-row head",
    "q286_kmv_set_ops" -> "1x1 cross join of two singleton sketch aggregates (set-algebra report row)",
  )

  test("no query plans a CartesianProduct; BNLJ only where justified") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      val p = q(spark, sf).queryExecution.executedPlan.toString
      if (p.contains("CartesianProduct"))
        offenders += s"$name: CartesianProduct"
      if (p.contains("BroadcastNestedLoopJoin") && !bnljJustified.contains(name))
        offenders += s"$name: unjustified BroadcastNestedLoopJoin"
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
