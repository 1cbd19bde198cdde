package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Similarity search over the `embeddings` table (Array[Float], 64-dim).
  *
  * Brute-force cosine top-k is the correctness baseline: broadcast the
  * query set, stream the corpus once, per-partition top-k via window —
  * O(corpus x queries) FLOPs but a single scan and one small shuffle of
  * k x queries rows, which is exactly how you'd run it at 100 TB for a
  * small query batch. The scale path is sign-LSH bucketing (q69): 16
  * hyperplane signs -> bucket join, probing only matching buckets —
  * candidates drop ~2^16-fold; recall is pinned by SimilaritySpec
  * against the brute-force baseline.
  *
  * Dot products run in double through the native `vector_dot` Catalyst
  * expression (graft.functions.VectorDot — codegen'd tight loop; the
  * earlier zip_with + aggregate spelling evaluated its lambdas
  * interpreted and allocated a zipped array per row). Accumulation order
  * is identical, so scores are bit-for-bit unchanged. Hyperplanes are
  * generated deterministically so results reproduce everywhere.
  */
object Similarity {

  private def dot(x: Column, y: Column) =
    graft.functions.VectorOps.vector_dot(x, y)

  /** cosine(a, b) computed in double precision. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Brute-force cosine top-k for query vectors vec_id < nQueries. */
  def bruteForceTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val scored = emb.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .withColumn("score", round(cosine(col("qvec"), col("embedding")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id"), col("score"))
  }

  /** ANN top-k baseline: 5 queries x top-10, oracle-checked. */
  val q68_cosine_topk: Q = (s, d) => {
    bruteForceTopK(Tables.embeddings(s, d), nQueries = 5, k = 10)
      .orderBy(col("qid"), col("rnk"))
  }

  /** Sign-LSH (random hyperplane) bucketed ANN, banded like MinHash-LSH:
    * 16 hyperplane sign bits split into 4 bands x 4 bits; vectors joining
    * a query on ANY band become candidates, then exact cosine re-ranks.
    * Deterministic ±1 hyperplanes derive from MurmurHash3 of (bit, dim).
    * Rows-only (no DuckDB equivalent); recall vs the q68 brute force is
    * pinned in SimilaritySpec. */
  val q69_ann_lsh: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val dim = 64
    val bands = 4
    val bitsPerBand = 4
    // All 16 hyperplane signs in ONE pass: a single ±1 matrix literal
    // dotted against the embedding (one typedLit + 16 vector_dot calls,
    // not 16x64 element_at terms — keeps the plan string compact).
    val planes = typedLit((0 until bands * bitsPerBand).map { j =>
      (0 until dim).map { i =>
        if (java.lang.Long.hashCode(
          scala.util.hashing.MurmurHash3.productHash((j, i))) % 2 == 0) 1.0 else -1.0
      }
    })
    val bits = transform(planes, p =>
      when(graft.functions.VectorOps.vector_dot(col("embedding"), p) >= 0,
        lit(1)).otherwise(lit(0)))
    val banded = emb.select(col("vec_id"), bits.as("bits"))
      .select(col("vec_id"), explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          (0 until bitsPerBand).map(r =>
            element_at(col("bits"), b * bitsPerBand + r + 1) * (1 << r)).reduce(_ + _).as("bv"))
      }: _*)).as("bb"))
      .select(col("vec_id"), col("bb.band").as("band"), col("bb.bv").as("bv"))
    val qBanded = banded.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("band"), col("bv"))
    // Dedup candidates on ids ONLY (a pair seen via several bands), then
    // rejoin the vectors — the distinct never shuffles embeddings.
    val candIds = banded.join(broadcast(qBanded), Seq("band", "bv"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id")).distinct()
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
    emb.join(broadcast(candIds), Seq("vec_id"))
      .join(broadcast(queries), Seq("qid"))
      .withColumn("score", round(cosine(col("qvec"), col("embedding")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("qid"), col("rnk"), col("vec_id"), col("score"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** Deterministic perturbed twins for the near-dup gate rows: vec_id
    * shifted by 10^7, element i scaled by 1+eps (even i) / 1-eps (odd i),
    * entirely in FLOAT so the DuckDB oracle reproduces the bits with
    * `CAST(x * CAST(1.08 AS FLOAT) AS FLOAT)` (float multiply == double
    * multiply of floats rounded to float, and float(1±0.08f) equals the
    * nearest float to 1.08/0.92). Worst-case cosine(v, twin) >=
    * (1-eps)/(1+eps) ≈ 0.852 > 0.8, so every twin pair is a true
    * near-dup the pipeline must surface. Shape: ONE scan + explode over
    * [original, twin] structs — NOT a self-union. Union-of-same-source
    * trips Spark's Union constraint rewriting ("key not found") once the
    * result fans out into nearDupLsh's three-way self-reference, which
    * is what forced a codegen-killing RDD round-trip barrier here until
    * round 5; the Generate spelling keeps the whole plan in Catalyst
    * (PipelineSpec pins it) and halves the read besides. The twin terms
    * are literal-factor products, no lambda. All other columns pass
    * through unchanged. */
  private def augmentWithTwins(emb: DataFrame, eps: Float, dim: Int = 64): DataFrame = {
    val scaled = array((0 until dim).map { i =>
      col("embedding").getItem(i) *
        lit(if (i % 2 == 0) 1.0f + eps else 1.0f - eps)
    }: _*)
    val otherCols = emb.columns.filterNot(Set("vec_id", "embedding")).map(col).toSeq
    val pair = array(
      struct(col("vec_id").as("vec_id"), col("embedding").as("embedding")),
      struct((col("vec_id") + lit(10000000L)).as("vec_id"), scaled.as("embedding")))
    emb.select(otherCols :+ explode(pair).as("r"): _*)
      .select(otherCols :+ col("r.vec_id").as("vec_id") :+ col("r.embedding").as("embedding"): _*)
  }

  /** Embedding near-duplicate pairs: same-label pairs with cosine >= 0.8
    * (label acts as the blocking key, the way a cluster/shard id would at
    * scale). The shipped corpus has no natural cosine>=0.8 pairs at any
    * SF, so the corpus is unioned with planted perturbed twins (same
    * label, so the blocking key routes each vector to its twin) — the
    * row-count gate is non-vacuous: a broken join or cosine yields 0 or
    * wrong rows, and the DuckDB oracle plants the identical twins.
    *
    * Scaling contract: this is the GROUND-TRUTH row — within-block
    * all-pairs, O(sum |block|^2), valid only while the blocking key keeps
    * blocks small. When one block dominates (or there is no usable key),
    * use the sub-quadratic paths instead: banded sign-LSH (q111 /
    * nearDupLsh) or quantized cells (q180 / withinCellPairs). */
  val q70_embedding_neardup: Q = (s, d) => {
    val base = Tables.embeddings(s, d)
      .select(col("label"), col("vec_id"), col("embedding"))
    val emb = augmentWithTwins(base, eps = 0.08f)
    emb.as("a").join(emb.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("score", round(cosine(col("a.embedding"), col("b.embedding")), 6))
      .filter(col("score") >= 0.8)
      .select(col("a.vec_id").as("ida"), col("b.vec_id").as("idb"), col("score"))
      .orderBy(col("ida"), col("idb"))
  }

  /** IVF-style ANN: partition the corpus into nList inverted lists by
    * nearest centroid, probe only the nProbe closest lists per query,
    * exact-rerank the candidates. Centroids start from seed vectors
    * (vec_id < nList) and are refined by `lloydIters` Lloyd/k-means
    * passes expressed as DataFrame ops (assign via max_by — one
    * aggregation, no window over the corpus — then per-dimension mean).
    * The corpus is assigned in ONE pass (N x nList cosines), queries then
    * touch nProbe/nList of the corpus — the 100 TB path where brute
    * force is N x Q. Rows-only; recall vs q68 pinned in PipelineSpec. */
  def ivfTopK(emb: DataFrame, nList: Int, nProbe: Int,
              nQueries: Int, k: Int, lloydIters: Int = 2): DataFrame = {
    val seed = emb.filter(col("vec_id") < nList)
      .select(col("vec_id").as("cid"),
              expr("transform(embedding, v -> CAST(v AS DOUBLE))").as("cvec"))

    /** Nearest centroid per corpus vector — max_by keeps it a plain
      * two-phase aggregation (a window here would sort N x nList rows). */
    def assign(cent: DataFrame): DataFrame =
      emb.crossJoin(broadcast(cent))
        .withColumn("cscore", round(cosine(col("embedding"), col("cvec")), 6))
        .groupBy(col("vec_id"))
        .agg(max_by(col("cid"), struct(col("cscore"), -col("cid"))).as("cid"))

    val cent = (0 until lloydIters).foldLeft(seed) { (c, _) =>
      assign(c)
        .join(emb, Seq("vec_id"))
        .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cid"), col("pos")).agg(avg(col("v")).as("m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cid"), expr("transform(pm, x -> x.m)").as("cvec"))
    }

    val assigned = assign(cent).join(emb, Seq("vec_id"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val wp = Window.partitionBy(col("qid")).orderBy(col("cscore").desc, col("cid"))
    val probes = queries.crossJoin(broadcast(cent))
      .withColumn("cscore", round(cosine(col("qvec"), col("cvec")), 6))
      .withColumn("crn", row_number().over(wp))
      .filter(col("crn") <= nProbe)
      .drop("cvec", "cscore", "crn")
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
    probes.join(assigned, Seq("cid"))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("score", round(cosine(col("qvec"), col("embedding")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id"), col("score"))
  }

  val q87_ann_ivf: Q = (s, d) =>
    ivfTopK(Tables.embeddings(s, d), nList = 16, nProbe = 4, nQueries = 5, k = 10)
      .orderBy(col("qid"), col("rnk"))

  /** IVF with lloydIters=0: centroids ARE the seed vectors, so the whole
    * pipeline (assign by rounded cosine with cid tiebreak, probe 4/16
    * lists, exact rerank) is a closed-form computation DuckDB can replay
    * — this is the ANN family's hash-exact gate row, complementing q87's
    * Lloyd-refined recall gate. Same plan shape as q87 (broadcast
    * centroids, one corpus assignment pass, probe-bounded candidate
    * scan), so the hash pins the production path's mechanics exactly. */
  val q256_ann_ivf_exact: Q = (s, d) =>
    ivfTopK(Tables.embeddings(s, d), nList = 16, nProbe = 4, nQueries = 5, k = 10,
        lloydIters = 0)
      .orderBy(col("qid"), col("rnk"))

  /** Sign-LSH blocked near-duplicate pairs — the 100 TB path for q70's
    * contract: 16 bands x 8 bits from 128 deterministic hyperplanes,
    * bucket self-join per band (equi-join, never all-pairs), exact cosine
    * verify. Every emitted pair truly has cosine >= threshold (precision
    * 1 by construction); recall ~1-(1-p^8)^16 where p = 1 - acos(cos)/pi
    * (≈0.94 at cosine 0.8), pinned on planted near-dups in PipelineSpec.
    * Rows-only for the gate: this corpus has no natural pairs >= 0.8, so
    * the oracle-exact q70 stays the ground-truth query. */
  def nearDupLsh(emb: DataFrame, threshold: Double,
                 bands: Int = 16, bitsPerBand: Int = 8,
                 maxBucket: Int = 4096): DataFrame = {
    val dim = 64
    val planes = typedLit((0 until bands * bitsPerBand).map { j =>
      (0 until dim).map { i =>
        if (java.lang.Long.hashCode(scala.util.hashing.MurmurHash3
          .productHash((j + 1000, i))) % 2 == 0) 1.0 else -1.0
      }
    })
    val bits = transform(planes, p =>
      when(graft.functions.VectorOps.vector_dot(col("embedding"), p) >= 0,
        lit(1)).otherwise(lit(0)))
    // Pinned (lazy localCheckpoint): rawBanded is consumed by stats, both
    // self-join sides and the star path — 3+ lineage copies of the
    // hyperplane-projection scan otherwise, which AQE's stage reuse does
    // NOT collapse (join-injected IsNotNull filters canonicalize the
    // copies differently; measured r14, same finding as Dedup.pinSliver).
    // The pinned set is the band index (corpus x bands id/byte rows, the
    // same sliver class Dedup.bandIndex pins), NOT the corpus: the
    // embedding scan itself stays a native columnar FileScan, so the
    // round-4 "RDD barrier on the gate path" regression (whole-plan
    // codegen loss) cannot recur — PipelineSpec pins codegen survival.
    // spread: the fixture embedding table is one row group, so the
    // hyperplane projection would run on ONE task (§2.5 input skew);
    // no-op at real scale. Keyed by vec_id so the verify joins below
    // see deterministic placement.
    // spread: the fixture embedding table is one row group, so the
    // hyperplane projection would run on ONE task (§2.5 input skew);
    // no-op at real scale (Tables.spread).
    //
    // Bucket size + min as a WINDOW over (band, bv) INSIDE the pinned
    // band index — the Dedup.lshCandidates restructure (guide §2.4,
    // measured on q65): the old shape paid a stats aggregation plus two
    // broadcast builds (ok buckets, over-cap buckets) plus a semi-join
    // and a star join over the pin. The window is one shuffle in the pin
    // job, and every consumer — both self-join sides and the star path —
    // is a plain filter over the pinned rows. The pin carries the
    // child's size ESTIMATE (sliver-sized: corpus x bands id/int rows),
    // so at bench scale the planner broadcast-joins the bounded side
    // (zero exchanges for pair enumeration — verified in the r15 plan)
    // and at real scale the same stats degrade the join to a shuffle —
    // nothing corpus-sized is ever force-broadcast. Skew exposure is
    // unchanged: a hot (band, bv) bucket landed in one task under the
    // old stats/join shuffles exactly as under the window partition.
    // Over-cap buckets still emit a STAR around the bucket's min vec_id
    // (linear) instead of being dropped: members stay reachable and
    // transitive closure (Dedup.connectedComponents) recovers the clique.
    val w = Window.partitionBy(col("band"), col("bv"))
    val sized = graft.Tables.spread(emb, col("vec_id"))
      .select(col("vec_id"), bits.as("bits"))
      .select(col("vec_id"), explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          (0 until bitsPerBand).map(r =>
            element_at(col("bits"), b * bitsPerBand + r + 1) * (1 << r)).reduce(_ + _).as("bv"))
      }: _*)).as("bb"))
      .select(col("vec_id"), col("bb.band").as("band"), col("bb.bv").as("bv"))
      .withColumn("bsz", count(lit(1)).over(w))
      .withColumn("minid", min(col("vec_id")).over(w))
      .localCheckpoint(false)
    val bounded = sized.filter(col("bsz") <= maxBucket)
      .select(col("vec_id"), col("band"), col("bv"))
    val pairwise = bounded.as("a").join(bounded.as("b"), Seq("band", "bv"))
      .where(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("ida"), col("b.vec_id").as("idb"))
    val starred = sized
      .filter(col("bsz") > maxBucket && col("vec_id") =!= col("minid"))
      .select(col("minid").as("ida"), col("vec_id").as("idb"))
    // NOT pinned: the candidate set feeds ONE downstream lineage (the
    // two verify joins chain off it in a single plan), so a pin would
    // only pay an extra materialization. The planner cannot broadcast
    // the candidate side either way (join/distinct output estimates are
    // far above the threshold), so both verify joins keep it streaming.
    val candIds = pairwise.union(starred).distinct()
    // Per-VECTOR norms computed once on the join sides instead of per
    // PAIR inside cosine(): the verify set is the hot path (the 8-bit
    // band space saturates on dense corpora, so candidates are many),
    // and cosine's spelling re-derives sqrt(dot(v, v)) for both sides
    // of every pair — 3 dot products per pair where 1 suffices. The
    // score is bit-identical: dot/(na*nb) with na = sqrt(dot(a, a)) is
    // the same IEEE expression tree cosine() evaluates, factored.
    def norm(e: Column) = sqrt(graft.functions.VectorOps.vector_dot(e, e))
    val va = emb.select(col("vec_id").as("ida"), col("embedding").as("ea"),
                        norm(col("embedding")).as("na"))
    val vb = emb.select(col("vec_id").as("idb"), col("embedding").as("eb"),
                        norm(col("embedding")).as("nb"))
    candIds.join(va, Seq("ida")).join(vb, Seq("idb"))
      .withColumn("score", round(
        graft.functions.VectorOps.vector_dot(col("ea"), col("eb")) /
          (col("na") * col("nb")), 6))
      .filter(col("score") >= threshold)
      .select(col("ida"), col("idb"), col("score"))
  }

  /** Gate variant: the shipped corpus has no natural cosine>=0.8 pairs at
    * any SF, so running nearDupLsh on it alone returns 0 rows — a check
    * that would also pass on a broken implementation. To make the driver
    * row-count check meaningful, augment the corpus with the
    * deterministic twins (augmentWithTwins — single-scan explode); recall
    * at cos~0.99 is ~1, so spark_rows > 0 whenever the banded path works
    * end-to-end. The augmented corpus feeds nearDupLsh's three-way
    * self-reference directly — the whole plan stays in Catalyst/codegen
    * (PipelineSpec pins no-ExistingRDD). */
  val q111_neardup_lsh: Q = (s, d) => {
    val base = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    nearDupLsh(augmentWithTwins(base, eps = 0.08f), 0.8)
      .orderBy(col("ida"), col("idb"))
  }

  /** SemDeDup-style quantized-cell canonicalization — the cheap first
    * stage of embedding dedup at corpus scale: sign-quantize the leading
    * `bits` dimensions into a cell code, then canonicalize per cell
    * (min vec_id) with membership stats. One map-side-combinable shuffle
    * keyed by the cell code; no pairwise work at all, so it streams at
    * scan speed on 100 TB. Production tuning raises `bits` (16–24 over
    * PCA'd dims) so cells stay small; the within-cell exact-cosine
    * verify that follows is exactly the q70/q111 machinery applied per
    * cell. Complements LSH near-dup: cells partition the corpus (every
    * vector lands in exactly one), so downstream jobs can shard by cell
    * with no candidate blow-up. */
  /** The sign-quantized cell code over the leading `bits` dims — the ONE
    * definition shared by quantizedCells (q179) and withinCellPairs
    * (q180), so the partitioning and the pairing can never silently
    * diverge on a quantization-rule change. */
  private def cellCode(bits: Int): Column =
    concat((0 until bits).map(i =>
      when(col("embedding").getItem(i) >= 0, lit("1")).otherwise(lit("0"))): _*)

  def quantizedCells(emb: org.apache.spark.sql.DataFrame, bits: Int)
      : org.apache.spark.sql.DataFrame = {
    emb.select(col("vec_id"), col("label"), cellCode(bits).as("cell"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_members"),
           min(col("vec_id")).as("canonical_id"),
           countDistinct(col("label")).as("n_labels"))
      .withColumn("has_dups", col("n_members") >= 2)
  }

  val q179_quantized_cells: Q = (s, d) =>
    quantizedCells(Tables.embeddings(s, d), bits = 8).orderBy(col("cell"))

  /** SemDeDup proper: exact-cosine near-dup pairs WITHIN the quantized
    * cells of q179. The cells partition the corpus (each vector is in
    * exactly one), so pairwise work is bounded by sum(|cell|²) — with
    * `bits` sized so cells stay O(corpus/2^bits), this is the
    * linear-ish scale path that q70's label-blocked all-pairs ground
    * truth is not, and unlike the banded-LSH q111 it is fully
    * SQL-expressible, hence oracle-checked end to end. The join is an
    * equi-join on the cell code (shuffle hash/SMJ, never cartesian);
    * the 0.3 threshold reflects that sharing 8 sign bits already
    * implies mild positive cosine — production raises both `bits` and
    * the threshold together. */
  def withinCellPairs(emb: org.apache.spark.sql.DataFrame, bits: Int,
                      threshold: Double): org.apache.spark.sql.DataFrame = {
    val coded = emb.select(col("vec_id"), col("embedding"), cellCode(bits).as("cell"))
    coded.as("a").join(coded.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("score", round(cosine(col("a.embedding"), col("b.embedding")), 6))
      .filter(col("score") >= threshold)
      .select(col("a.cell").as("cell"),
              col("a.vec_id").as("ida"), col("b.vec_id").as("idb"), col("score"))
  }

  val q180_semdedup: Q = (s, d) =>
    withinCellPairs(Tables.embeddings(s, d), bits = 8, threshold = 0.3)
      .orderBy(col("ida"), col("idb"))

  /** Int8 embedding quantization — the store-ready compression step every
    * large vector corpus runs before serving (4x size cut vs float32):
    * per-vector max-abs scale to [-127, 127], elementwise floor. Pure
    * projection, scan speed, no shuffle at all. The gate emits
    * integer-exact digests (sum/min/max of the quantized values) so the
    * oracle is bit-stable: floor() is specified identically in both
    * engines, and every multiply/divide is one IEEE double op with
    * identical association. */
  val q200_embed_quantize: Q = (s, d) => {
    val maxabs = expr(
      "aggregate(embedding, CAST(0.0 AS DOUBLE), (m, x) -> greatest(m, abs(CAST(x AS DOUBLE))))")
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"), maxabs.as("maxabs"))
      .select(col("vec_id"), round(col("maxabs"), 6).as("maxabs_r"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / maxabs)) AS BIGINT))").as("q"))
      .select(col("vec_id"), col("maxabs_r"),
        expr("aggregate(q, CAST(0 AS BIGINT), (a, v) -> a + v)").as("q_sum"),
        array_min(col("q")).as("q_min"),
        array_max(col("q")).as("q_max"))
      .orderBy(col("vec_id"))
  }

  /** Product-quantization ANN (Jégou–Douze–Schmid 2011, "Product
    * Quantization for Nearest Neighbor Search"; the compressed-index
    * path the reference line has no analog for): L2-normalize, split
    * each vector into `m` subvectors, learn a `ks`-entry codebook per
    * subspace (Lloyd passes as DataFrame ops, seeded from the first
    * `ks` vectors like [[ivfTopK]]), store each vector as `m` small
    * codes — at ks<=256 that is m BYTES per vector, a 32x compression
    * of this 64-float column. Queries run Asymmetric Distance
    * Computation: one exact m x ks table of query-to-centroid
    * sub-distances per query, broadcast; a candidate's approximate
    * distance is m table lookups summed (codegen'd array ops — zero
    * float math against corpus vectors). The ADC shortlist is then
    * exact-reranked by cosine.
    *
    * Scale shape: codebooks and ADC tables are tiny and BROADCAST; the
    * corpus is scanned once to encode and once per query batch for
    * lookups — never shuffled, never all-pairs. At 100 TB only the
    * m-byte codes are rescanned per batch, which is the method's whole
    * point. On normalized vectors ||a-b||^2 = 2 - 2 cos(a,b), so the
    * ADC ordering approximates the cosine ordering the reranker and
    * [[bruteForceTopK]] use. Distances round to 6 before argmin/rank
    * (ties by id) so assignments are stable across partitionings. */
  private def pqL2(a: String, b: String): Column = round(
    expr(s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), 0D, (acc, v) -> acc + v)"), 6)

  private def pqAssign(sub: DataFrame, cent: DataFrame): DataFrame =
    sub.join(broadcast(cent), Seq("sub"))
      .withColumn("d2", pqL2("sv", "cvec"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"))

  /** (subvectors, trained codebooks) for [[pqEncode]]/[[pqTopK]]. */
  private def pqModel(emb: DataFrame, m: Int, ks: Int,
                      lloydIters: Int): (DataFrame, DataFrame) = {
    require(m >= 1 && ks >= 2, s"need m >= 1 subspaces (got $m), ks >= 2 codes (got $ks)")
    // dimension is schema-scale metadata (one 1-row aggregate, same
    // contract as PipelineOps' bounds lookups)
    val dims = emb.agg(min(size(col("embedding"))).as("lo"),
                       max(size(col("embedding"))).as("hi")).head()
    val dim = dims.getInt(0)
    require(dim == dims.getInt(1), s"ragged embedding column: $dims")
    require(dim % m == 0, s"dim=$dim not divisible by m=$m subspaces")
    val subdim = dim / m
    val norm = emb.select(col("vec_id"),
      expr("transform(embedding, v -> CAST(v AS DOUBLE) / " +
           "sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * x), " +
           "0D, (a, x) -> a + x)))").as("nv"))
    val sub = norm.select(col("vec_id"), posexplode(
      expr(s"transform(sequence(0, ${m - 1}, 1), j -> slice(nv, j * $subdim + 1, $subdim))"))
        .as(Seq("sub", "sv")))
    val seed = sub.filter(col("vec_id") < ks)
      .select(col("sub"), col("vec_id").as("cid"), col("sv").as("cvec"))
    val cent = (0 until lloydIters).foldLeft(seed) { (c, _) =>
      pqAssign(sub, c)
        .join(sub, Seq("vec_id", "sub"))
        .select(col("sub"), col("cid"), posexplode(col("sv")).as(Seq("pos", "v")))
        .groupBy(col("sub"), col("cid"), col("pos")).agg(avg(col("v")).as("cm"))
        .groupBy(col("sub"), col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("cm")))).as("pm"))
        .select(col("sub"), col("cid"), expr("transform(pm, x -> x.cm)").as("cvec"))
    }
    (sub, cent)
  }

  /** (vec_id, codes) from per-subspace assignments — ONE definition of
    * the stored code layout (subspace-sorted cid list), shared by the
    * index builder and the query path so ordering/tie-breaking can never
    * diverge between them (or from the q257 oracle's list(cid ORDER BY
    * sub)). */
  private def codesOf(sub: DataFrame, cent: DataFrame): DataFrame =
    pqAssign(sub, cent)
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("sub"), col("cid")))).as("sc"))
      .select(col("vec_id"), expr("transform(sc, x -> x.cid)").as("codes"))

  /** The stored PQ index: (vec_id, codes) with `codes` = m codebook
    * indices ordered by subspace — m bytes per vector at ks <= 256. */
  def pqEncode(emb: DataFrame, m: Int, ks: Int, lloydIters: Int = 2): DataFrame = {
    val (sub, cent) = pqModel(emb, m, ks, lloydIters)
    codesOf(sub, cent)
  }

  def pqTopK(emb: DataFrame, m: Int, ks: Int, nQueries: Int, k: Int,
             shortlist: Int = 50, lloydIters: Int = 2): DataFrame = {
    val (sub, cent) = pqModel(emb, m, ks, lloydIters)
    val codes = codesOf(sub, cent)

    // per-query ADC tables: dtab[sub][cid] = exact query-centroid sub-distance
    val qsub = sub.filter(col("vec_id") < nQueries).withColumnRenamed("vec_id", "qid")
    val dtab = qsub.join(broadcast(cent), Seq("sub"))
      .withColumn("qd", pqL2("sv", "cvec"))
      .groupBy(col("qid"), col("sub"))
      .agg(array_sort(collect_list(struct(col("cid"), col("qd")))).as("cd"))
      .groupBy(col("qid"))
      .agg(array_sort(collect_list(struct(col("sub"),
        expr("transform(cd, x -> x.qd)").as("t")))).as("st"))
      .select(col("qid"), expr("transform(st, x -> x.t)").as("dtab"))

    val wAdc = Window.partitionBy(col("qid")).orderBy(col("approx"), col("vec_id"))
    val short = codes.crossJoin(broadcast(dtab))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("approx", round(expr(
        "aggregate(zip_with(codes, dtab, (c, t) -> element_at(t, CAST(c + 1 AS INT))), " +
        "0D, (acc, v) -> acc + v)"), 6))
      .withColumn("srn", row_number().over(wAdc))
      .filter(col("srn") <= shortlist)
      .select(col("qid"), col("vec_id"))

    // exact rerank of the shortlist only
    val wK = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
    short
      .join(emb, Seq("vec_id"))
      .join(broadcast(emb.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
                        .filter(col("qid") < nQueries)), Seq("qid"))
      .withColumn("score", round(cosine(col("qvec"), col("embedding")), 6))
      .withColumn("rnk", row_number().over(wK))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id"), col("score"))
  }

  /** PQ gate: 8 subspaces x 16 codes over the 64-dim corpus, ADC
    * shortlist 50, exact rerank to top-10. Rows-only (k-means has no
    * DuckDB spelling); recall vs q68 + code-shape/compression contracts
    * pinned in PipelineSpec. */
  val q224_ann_pq: Q = (s, d) =>
    pqTopK(Tables.embeddings(s, d), m = 8, ks = 16, nQueries = 5, k = 10)
      .orderBy(col("qid"), col("rnk"))

  /** PQ with lloydIters=0: codebooks ARE the seed subvectors, so encode,
    * ADC tables, shortlist, and exact rerank are a closed-form
    * computation the DuckDB oracle replays bit-exactly (list folds in
    * the same sequential order as zip_with/aggregate; per-stage round-6
    * stabilizes argmin/rank ties). Hash-pins the full PQ mechanics —
    * code assignment, table lookup arithmetic, shortlist and rerank
    * windows — complementing q224's Lloyd-refined recall gate. */
  val q257_ann_pq_exact: Q = (s, d) =>
    pqTopK(Tables.embeddings(s, d), m = 8, ks = 16, nQueries = 5, k = 10,
        shortlist = 50, lloydIters = 0)
      .orderBy(col("qid"), col("rnk"))

  /** Per-label embedding cohesion — the within-class-scatter report an
    * embedding-quality monitor runs (is a class collapsing? drifting
    * apart?). Values quantize to integer milli-units first (the q207
    * trick), so every aggregate is an exact integer sum in any partition
    * order; the mean squared distance to the class centroid comes out of
    * the algebraic identity n^2 * d_i = sum_pos (n*qv_i - S_pos)^2 —
    * never a float centroid, never an order-dependent double sum. The
    * only float op is ONE final IEEE division, bit-stable across
    * engines. Two shuffles, both keyed on (label[, pos]) — dimension
    * cardinality, not corpus cardinality. */
  def labelCohesion(emb: DataFrame): DataFrame = {
    val q = emb.select(col("label"), col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("label"), col("vec_id"), col("pos"),
              floor(col("v").cast("double") * 1000).as("qv"))
    val s = q.groupBy(col("label"), col("pos"))
      .agg(sum(col("qv")).as("sp"), count(lit(1)).as("n"))
    // exact integers, but NOT in LongType: (n*qv - sp)^2 scales ~n^3 per
    // label and a long sum would wrap silently past 9.2e18 (DuckDB sums
    // in HUGEINT). Decimal(38,0) keeps the identity exact to 38 digits;
    // the final cast back to long is range-checked by the gate values.
    val diff = (col("n") * col("qv") - col("sp"))
      .cast(org.apache.spark.sql.types.DecimalType(38, 0))
    q.join(s, Seq("label", "pos"))
      .groupBy(col("label"))
      .agg(
        max(col("n")).as("n_vecs"),
        sum(diff * diff).as("scatter_dec"))
      .select(col("label"), col("n_vecs"),
        col("scatter_dec").cast("long").as("scatter"),
        (col("scatter_dec").cast("double") /
          (col("n_vecs").cast("double") * col("n_vecs") * col("n_vecs") * lit(1000000.0)))
          .as("mean_sq_dist"))
      .orderBy(col("label"))
  }

  val q226_label_cohesion: Q = (s, d) => labelCohesion(Tables.embeddings(s, d))

  /** Label-noise audit — the mislabel detector a pipeline runs before
    * trusting labels for training: each audited vector's k=10 exact
    * cosine neighbors vote, and a low same-label count flags a probable
    * mislabel. Reuses the q68 brute-force machinery (broadcast audit
    * slice, codegen'd vector_dot, one window top-k), so the corpus is
    * scanned once; at 100 TB the audit slice stays a bounded sample and
    * the kNN swaps to [[ivfTopK]]/[[pqTopK]] with the voting unchanged.
    * On THIS synthetic corpus labels correlate only weakly with
    * geometry, so most audited vectors rightly read as suspect
    * (181/200 at sf0.01) — the gate still separates both classes, and
    * PipelineSpec pins that a deliberately flipped label lands at
    * n_same = 0. */
  def labelAgreement(emb: DataFrame, nAudit: Int, k: Int): DataFrame = {
    val labels = emb.select(col("vec_id"), col("label"))
    bruteForceTopK(emb, nQueries = nAudit, k = k)
      .join(broadcast(labels.select(col("vec_id").as("qid"), col("label").as("qlabel"))),
            Seq("qid"))
      .join(broadcast(labels), Seq("vec_id"))
      .groupBy(col("qid"), col("qlabel"))
      .agg(sum(when(col("label") === col("qlabel"), 1L).otherwise(0L)).as("n_same"))
      .select(col("qid").as("vec_id"), col("qlabel").as("label"), col("n_same"),
              when(col("n_same") <= 2, 1).otherwise(0).as("suspect"))
      .orderBy(col("vec_id"))
  }

  val q231_label_noise: Q = (s, d) =>
    labelAgreement(Tables.embeddings(s, d), nAudit = 200, k = 10)

  /** Label-centroid drift between two corpus halves (even/odd vec_id —
    * the stand-in for yesterday's snapshot vs today's ingest): per
    * (label, pos) the exact-integer cross difference |Se*No - So*Ne| of
    * milli-quantized coordinate sums, summed over dimensions; dividing
    * by Ne*No*dim*1000 yields the mean |centroid delta| per dimension
    * with ONE final IEEE division (same bit-stability trick as
    * [[labelCohesion]]). Two shuffles keyed on (label, pos) — dimension
    * cardinality, not corpus cardinality. */
  val q235_label_drift: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val q = emb.select(col("label"), col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("label"), col("pos"),
        (col("vec_id") % 2 === 0).cast("int").as("even"),
        floor(col("v").cast("double") * 1000).as("qv"))
    val sums = q.groupBy(col("label"), col("pos"))
      .agg(sum(when(col("even") === 1, col("qv"))).as("se"),
           sum(when(col("even") === 0, col("qv"))).as("so"),
           sum(col("even")).cast("long").as("n_e"),
           sum(lit(1) - col("even")).cast("long").as("n_o"))
    sums.groupBy(col("label"))
      .agg(max(col("n_e")).as("n_even"), max(col("n_o")).as("n_odd"),
           sum(abs(col("se") * col("n_o") - col("so") * col("n_e"))).as("cross_abs"))
      .select(col("label"), col("n_even"), col("n_odd"), col("cross_abs"),
        (col("cross_abs").cast("double") /
          (col("n_even").cast("double") * col("n_odd") * lit(64000.0)))
          .as("mean_abs_drift"))
      .orderBy(col("label"))
  }

  /** Hash-exact sign-LSH gate: the q69/q111 banded random-hyperplane
    * pipeline re-run with md5-derived ±1 planes and INTEGER-quantized
    * dots, so every stage — plane derivation, sign bits, band buckets,
    * candidate equi-join, exact cosine verify — is DuckDB-replayable
    * (the q268 trick, applied to the embedding family). Quantized dots
    * (sum of floor(v*1000) x ±1, exact integers) make the sign bit
    * summation-order-proof; the only doubles are the final cosine, in
    * the list-ordered spelling q68/q70 prove engine-stable. The
    * Murmur/xxhash production variants (q69/q111) stay spec-only by
    * necessity; this row closes the family's last unhashed stage. The
    * oracle derives the planes from md5 INDEPENDENTLY in SQL — the two
    * engines must agree on the planes themselves, not just the pairs. */
  val q291_signlsh_md5: Q = (s, d) => {
    val dim = 64; val bands = 4; val bitsPerBand = 4
    val md = java.security.MessageDigest.getInstance("MD5")
    def sgn(j: Int, k: Int): Long = {
      val h = md.digest(s"lsh_${j}_${k}".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0x8) == 0) 1L else -1L // first hex char in 0-7 -> +1
    }
    val planes = (0 until bands * bitsPerBand).map(j => (0 until dim).map(k => sgn(j, k)))
    // the corpus has no natural cosine>=0.8 pairs at any SF (q70's
    // finding), so the gate runs over the same planted-twin corpus —
    // the emitted pairs are the twin pairs that survive banding
    val aug = augmentWithTwins(
      Tables.embeddings(s, d).select(col("label"), col("vec_id"), col("embedding")),
      eps = 0.08f)
    val base = aug.select(col("vec_id"), col("embedding"),
      expr("transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT))").as("qv"))
    val bits = planes.zipWithIndex.map { case (p, j) =>
      val qdot = aggregate(
        zip_with(col("qv"), typedLit(p), (a, b) => a * b), lit(0L), (acc, x) => acc + x)
      when(qdot >= 0, lit(1)).otherwise(lit(0)).as(s"bit$j")
    }
    val withBits = base.select(Seq(col("vec_id")) ++ bits: _*)
    val banded = withBits.select(col("vec_id"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            (0 until bitsPerBand).map(r =>
              col(s"bit${b * bitsPerBand + r}") * (1 << r)).reduce(_ + _).as("bv"))
        }: _*)).as("bb"))
      .select(col("vec_id"), col("bb.band").as("band"), col("bb.bv").as("bv"))
    // dedup candidate pairs on IDS ONLY, then rejoin the vectors — the
    // q69/nearDupLsh discipline: a pair surfaced by several bands must
    // not ship its two 64-float embeddings through the distinct exchange
    // once per band
    val a = banded.select(col("vec_id").as("ida"), col("band"), col("bv"))
    val b = banded.select(col("vec_id").as("idb"), col("band"), col("bv"))
    val vecs = base.select(col("vec_id"), col("embedding"))
    a.join(b, Seq("band", "bv"))
      .filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb")).distinct()
      .join(vecs.select(col("vec_id").as("ida"), col("embedding").as("ea")), Seq("ida"))
      .join(vecs.select(col("vec_id").as("idb"), col("embedding").as("eb")), Seq("idb"))
      .withColumn("score", round(cosine(col("ea"), col("eb")), 6))
      .filter(col("score") >= 0.8)
      .select(col("ida"), col("idb"), col("score"))
      .orderBy(col("ida"), col("idb"))
  }


  val queries: Map[String, Q] = Map(
    "q291_signlsh_md5" -> q291_signlsh_md5,
    "q231_label_noise" -> q231_label_noise,
    "q235_label_drift" -> q235_label_drift,
    "q226_label_cohesion" -> q226_label_cohesion,
    "q224_ann_pq" -> q224_ann_pq,
    "q200_embed_quantize" -> q200_embed_quantize,
    "q179_quantized_cells" -> q179_quantized_cells,
    "q180_semdedup" -> q180_semdedup,
    "q68_cosine_topk" -> q68_cosine_topk,
    "q69_ann_lsh" -> q69_ann_lsh,
    "q70_embedding_neardup" -> q70_embedding_neardup,
    "q87_ann_ivf" -> q87_ann_ivf,
    "q111_neardup_lsh" -> q111_neardup_lsh,
    "q256_ann_ivf_exact" -> q256_ann_ivf_exact,
    "q257_ann_pq_exact" -> q257_ann_pq_exact,
  )

  /** DuckDB spelling of [[cosine]] over arbitrary vector expressions —
    * same sequential element order as vector_dot, so doubles (and their
    * round-6 images) agree bit-exactly across engines (q68 pins this). */
  private def cosSqlOf(x: String, y: String): String =
    s"""list_aggregate(list_transform(list_zip($x, $y),
       |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
       |  / (sqrt(list_aggregate(list_transform($x,
       |       v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), 'sum'))
       |     * sqrt(list_aggregate(list_transform($y,
       |       v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), 'sum')))""".stripMargin

  private val cosSql = cosSqlOf("a.embedding", "b.embedding")

  val oracles: Map[String, String] = Map(
    // Planes re-derived from md5 IN SQL (not copied as literals): both
    // engines must agree on the hyperplanes, the integer dots, the band
    // buckets, and the surviving pairs.
    "q291_signlsh_md5" ->
      s"""WITH aug AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 10000000,
         |    list_transform(embedding, (x, i) -> CAST(x * (CASE WHEN (i-1)%2=0
         |      THEN CAST(1.08 AS FLOAT) ELSE CAST(0.92 AS FLOAT) END) AS FLOAT))
         |  FROM embeddings),
         |planes AS (
         |  SELECT j, k,
         |    CASE WHEN substr(md5('lsh_' || j || '_' || k), 1, 1)
         |         IN ('0','1','2','3','4','5','6','7') THEN 1 ELSE -1 END AS s
         |  FROM (SELECT unnest(range(0, 16)) AS j),
         |       (SELECT unnest(range(0, 64)) AS k)),
         |dots AS (
         |  SELECT e.vec_id, p.j,
         |    CAST(SUM(CAST(floor(CAST(e.embedding[p.k + 1] AS DOUBLE) * 1000)
         |                  AS BIGINT) * p.s) AS BIGINT) AS dot
         |  FROM aug e, planes p GROUP BY 1, 2),
         |bands AS (
         |  SELECT vec_id, CAST(j // 4 AS INT) AS band,
         |    CAST(SUM(CASE WHEN dot >= 0 THEN 1 ELSE 0 END * (1 << (j % 4)))
         |         AS BIGINT) AS bv
         |  FROM dots GROUP BY 1, 2),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS ida, b.vec_id AS idb
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bv = b.bv AND a.vec_id < b.vec_id),
         |scored AS (
         |  SELECT cand.ida, cand.idb,
         |    round(${cosSqlOf("ea.embedding", "eb.embedding")}, 6) AS score
         |  FROM cand
         |  JOIN aug ea ON ea.vec_id = cand.ida
         |  JOIN aug eb ON eb.vec_id = cand.idb)
         |SELECT ida, idb, score FROM scored
         |WHERE score >= 0.8 ORDER BY ida, idb""".stripMargin,
    "q231_label_noise" ->
      s"""WITH scored AS (
         |  SELECT a.vec_id AS qid, a.label AS qlabel, b.label AS blabel,
         |    round($cosSql, 6) AS score, b.vec_id AS vec_id
         |  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
         |  WHERE a.vec_id < 200),
         |ranked AS (
         |  SELECT qid, qlabel, blabel,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rnk
         |  FROM scored),
         |agg AS (
         |  SELECT qid AS vec_id, qlabel AS label,
         |    CAST(SUM(CASE WHEN blabel = qlabel THEN 1 ELSE 0 END) AS BIGINT) AS n_same
         |  FROM ranked WHERE rnk <= 10 GROUP BY 1, 2)
         |SELECT vec_id, label, n_same,
         |  CAST(CASE WHEN n_same <= 2 THEN 1 ELSE 0 END AS INTEGER) AS suspect
         |FROM agg ORDER BY vec_id""".stripMargin,
    "q235_label_drift" ->
      """WITH q AS (
        |  SELECT label, pos,
        |    CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END AS even,
        |    CAST(floor(CAST(embedding[pos] AS DOUBLE) * 1000) AS BIGINT) AS qv
        |  FROM (SELECT label, vec_id, embedding,
        |          unnest(range(1, len(embedding) + 1)) AS pos
        |        FROM embeddings)),
        |s AS (SELECT label, pos,
        |        CAST(SUM(CASE WHEN even = 1 THEN qv END) AS BIGINT) AS se,
        |        CAST(SUM(CASE WHEN even = 0 THEN qv END) AS BIGINT) AS so,
        |        CAST(SUM(even) AS BIGINT) AS n_e,
        |        CAST(SUM(1 - even) AS BIGINT) AS n_o
        |      FROM q GROUP BY label, pos),
        |f AS (SELECT label, CAST(MAX(n_e) AS BIGINT) AS n_even,
        |        CAST(MAX(n_o) AS BIGINT) AS n_odd,
        |        CAST(SUM(abs(se * n_o - so * n_e)) AS BIGINT) AS cross_abs
        |      FROM s GROUP BY label)
        |SELECT label, n_even, n_odd, cross_abs,
        |  CAST(cross_abs AS DOUBLE) / (CAST(n_even AS DOUBLE) * n_odd * 64000.0)
        |    AS mean_abs_drift
        |FROM f ORDER BY label""".stripMargin,
    "q226_label_cohesion" ->
      """WITH q AS (
        |  SELECT label, vec_id, pos,
        |    CAST(floor(CAST(embedding[pos] AS DOUBLE) * 1000) AS BIGINT) AS qv
        |  FROM (SELECT label, vec_id, embedding,
        |          unnest(range(1, len(embedding) + 1)) AS pos
        |        FROM embeddings)),
        |s AS (SELECT label, pos, SUM(qv) AS sp, COUNT(1) AS n
        |      FROM q GROUP BY label, pos),
        |sc AS (SELECT q.label,
        |         CAST(MAX(n) AS BIGINT) AS n_vecs,
        |         CAST(SUM((n * qv - sp) * (n * qv - sp)) AS BIGINT) AS scatter
        |       FROM q JOIN s ON q.label = s.label AND q.pos = s.pos
        |       GROUP BY q.label)
        |SELECT label, n_vecs, scatter,
        |  CAST(scatter AS DOUBLE) /
        |    (CAST(n_vecs AS DOUBLE) * n_vecs * n_vecs * 1000000.0) AS mean_sq_dist
        |FROM sc ORDER BY label""".stripMargin,
    "q200_embed_quantize" ->
      """WITH m AS (
        |  SELECT vec_id, embedding,
        |    list_aggregate(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE))), 'max') AS maxabs
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, round(maxabs, 6) AS maxabs_r,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / maxabs)) AS BIGINT)) AS qv
        |  FROM m)
        |SELECT vec_id, maxabs_r,
        |  CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum,
        |  CAST(list_aggregate(qv, 'min') AS BIGINT) AS q_min,
        |  CAST(list_aggregate(qv, 'max') AS BIGINT) AS q_max
        |FROM q ORDER BY vec_id""".stripMargin,
    "q179_quantized_cells" -> {
      val cellSql = (0 until 8).map(i =>
        s"CASE WHEN embedding[${i + 1}] >= 0 THEN '1' ELSE '0' END").mkString(" || ")
      s"""WITH c AS (
         |  SELECT vec_id, label, $cellSql AS cell FROM embeddings)
         |SELECT cell, count(*) AS n_members, min(vec_id) AS canonical_id,
         |  count(DISTINCT label) AS n_labels, count(*) >= 2 AS has_dups
         |FROM c GROUP BY cell ORDER BY cell""".stripMargin
    },
    "q257_ann_pq_exact" ->
      s"""WITH nv AS (
         |  SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE) /
         |    sqrt(list_aggregate(list_transform(embedding,
         |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS nv
         |  FROM embeddings),
         |subv AS (
         |  SELECT vec_id, j.sub AS sub,
         |    list_slice(nv, j.sub * 8 + 1, j.sub * 8 + 8) AS sv
         |  FROM nv, (SELECT unnest(generate_series(0, 7)) AS sub) j),
         |cent AS (
         |  SELECT sub, vec_id AS cid, sv AS cvec FROM subv WHERE vec_id < 16),
         |d2 AS (
         |  SELECT s.vec_id, s.sub, c.cid,
         |    round(list_aggregate(list_transform(list_zip(s.sv, c.cvec),
         |      x -> (x[1] - x[2]) * (x[1] - x[2])), 'sum'), 6) AS d2
         |  FROM subv s JOIN cent c ON c.sub = s.sub),
         |codes AS (
         |  SELECT vec_id, list(cid ORDER BY sub) AS codes FROM (
         |    SELECT vec_id, sub, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn
         |    FROM d2) WHERE rn = 1 GROUP BY vec_id),
         |qd AS (
         |  SELECT s.vec_id AS qid, s.sub, c.cid,
         |    round(list_aggregate(list_transform(list_zip(s.sv, c.cvec),
         |      x -> (x[1] - x[2]) * (x[1] - x[2])), 'sum'), 6) AS qd
         |  FROM subv s JOIN cent c ON c.sub = s.sub WHERE s.vec_id < 5),
         |dtab AS (
         |  SELECT qid, list(t ORDER BY sub) AS dtab FROM (
         |    SELECT qid, sub, list(qd ORDER BY cid) AS t
         |    FROM qd GROUP BY qid, sub) GROUP BY qid),
         |approx AS (
         |  SELECT d.qid, c.vec_id,
         |    round(list_aggregate(list_transform(list_zip(c.codes, d.dtab),
         |      x -> x[2][CAST(x[1] + 1 AS INT)]), 'sum'), 6) AS approx
         |  FROM codes c CROSS JOIN dtab d WHERE c.vec_id <> d.qid),
         |short AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY approx, vec_id) AS srn
         |    FROM approx) WHERE srn <= 50),
         |scored AS (
         |  SELECT s.qid, s.vec_id,
         |    round(${cosSqlOf("q.embedding", "e.embedding")}, 6) AS score
         |  FROM short s
         |  JOIN embeddings q ON q.vec_id = s.qid
         |  JOIN embeddings e ON e.vec_id = s.vec_id),
         |ranked AS (
         |  SELECT qid, vec_id, score,
         |    ROW_NUMBER() OVER (PARTITION BY qid
         |                       ORDER BY score DESC, vec_id) AS rnk
         |  FROM scored)
         |SELECT qid, rnk, vec_id, score FROM ranked
         |WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin,
    "q256_ann_ivf_exact" ->
      s"""WITH cent AS (
         |  SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 16),
         |ca AS (
         |  SELECT e.vec_id, c.cid,
         |    round(${cosSqlOf("e.embedding", "c.cvec")}, 6) AS cscore
         |  FROM embeddings e CROSS JOIN cent c),
         |assigned AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id
         |                         ORDER BY cscore DESC, cid) AS rn
         |    FROM ca) WHERE rn = 1),
         |probes AS (
         |  SELECT qid, cid FROM (
         |    SELECT q.vec_id AS qid, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY round(${cosSqlOf("q.embedding", "c.cvec")}, 6) DESC,
         |                 c.cid) AS crn
         |    FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 5)
         |  WHERE crn <= 4),
         |scored AS (
         |  SELECT p.qid, a.vec_id,
         |    round(${cosSqlOf("q.embedding", "e.embedding")}, 6) AS score
         |  FROM probes p
         |  JOIN assigned a ON a.cid = p.cid AND a.vec_id <> p.qid
         |  JOIN embeddings q ON q.vec_id = p.qid
         |  JOIN embeddings e ON e.vec_id = a.vec_id),
         |ranked AS (
         |  SELECT qid, vec_id, score,
         |    ROW_NUMBER() OVER (PARTITION BY qid
         |                       ORDER BY score DESC, vec_id) AS rnk
         |  FROM scored)
         |SELECT qid, rnk, vec_id, score FROM ranked
         |WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin,
    "q68_cosine_topk" ->
      s"""WITH scored AS (
         |  SELECT a.vec_id AS qid, b.vec_id AS vec_id,
         |    round($cosSql, 6) AS score
         |  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
         |  WHERE a.vec_id < 5),
         |ranked AS (
         |  SELECT qid, vec_id, score,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rnk
         |  FROM scored)
         |SELECT qid, rnk, vec_id, score FROM ranked
         |WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin,
    "q70_embedding_neardup" ->
      s"""WITH aug AS (
         |  SELECT vec_id, label, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 10000000, label,
         |    list_transform(embedding, (x, i) -> CAST(x * (CASE WHEN (i-1)%2=0
         |      THEN CAST(1.08 AS FLOAT) ELSE CAST(0.92 AS FLOAT) END) AS FLOAT))
         |  FROM embeddings)
         |SELECT a.vec_id AS ida, b.vec_id AS idb,
         |  round($cosSql, 6) AS score
         |FROM aug a JOIN aug b
         |  ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE round($cosSql, 6) >= 0.8
         |ORDER BY ida, idb""".stripMargin,
    "q180_semdedup" -> {
      val cellSql = (i: String) => (0 until 8).map(j =>
        s"CASE WHEN $i.embedding[${j + 1}] >= 0 THEN '1' ELSE '0' END").mkString(" || ")
      s"""SELECT ${cellSql("a")} AS cell, a.vec_id AS ida, b.vec_id AS idb,
         |  round($cosSql, 6) AS score
         |FROM embeddings a JOIN embeddings b
         |  ON ${cellSql("a")} = ${cellSql("b")} AND a.vec_id < b.vec_id
         |WHERE round($cosSql, 6) >= 0.3
         |ORDER BY ida, idb""".stripMargin
    },
  )
}
