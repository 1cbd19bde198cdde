package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Synthetic 10x volume stress for the dedup family: replicate+perturb
  * the sf0.1 documents corpus in memory so that LSH/SimHash buckets
  * actually overflow the cap and connected components has real work —
  * turning the "banded, capped, star-fallback" 100 TB story into an
  * executed test rather than prose.
  *
  * Corpus: every sf0.1 document gets 10 replicas (doc_id*16+k), replica
  * k > 0 with a distinct token appended — a 10-clique of >= 0.9-Jaccard
  * near-dups per base doc. With the bucket cap lowered to 8, most clique
  * buckets are over-cap, so the star path MUST fire for the cliques to
  * survive.
  */
class ScaleStressSpec extends AnyFunSuite {
  import TestSession.spark

  private val sf01 = "/root/testdata/sf0.1"

  // 10 replicas per doc; k=0 keeps the original text, k>0 appends a
  // replica-specific token (near-dup, not exact-dup). Pinned in memory:
  // four candidate pipelines below would otherwise re-derive it each.
  private lazy val docs10 = {
    val base = Tables.documents(spark, sf01).select(col("doc_id"), col("text"))
    (0 until 10).map { k =>
      base.select((col("doc_id") * 16 + k).as("doc_id"),
        if (k == 0) col("text")
        else concat(col("text"), lit(s" zqstressrep$k")).as("text"))
    }.reduce(_ unionAll _).localCheckpoint(true)
  }

  private lazy val nDocs = docs10.count()

  private lazy val minhashSigs =
    Dedup.minhashSignatures(Dedup.shingleHashes(docs10)).localCheckpoint(true)

  test("10x corpus overflows LSH buckets; star path fires and stays linear") {
    val capped = Dedup.lshCandidates(minhashSigs, maxBucket = 8)
    val plan = capped.queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "candidate generation must stay an equi-join at 10x volume")
    val capN = capped.count()
    val uncN = Dedup.lshCandidates(minhashSigs, maxBucket = Int.MaxValue).count()
    // capN < uncN proves buckets really went over-cap AND the cap engaged;
    // capN > 0 proves over-cap buckets emit stars instead of being dropped
    assert(capN > 0, "no candidates at all — star path dropped over-cap buckets?")
    assert(capN < uncN, s"no bucket exceeded the cap (cap=$capN unc=$uncN) — stress corpus too weak")
    // linearity: O(n) candidates with a constant average degree, the
    // property that dies first under quadratic bucket blowup
    assert(capN <= 20L * nDocs, s"capped candidates superlinear: $capN pairs for $nDocs docs")
    assert(uncN <= 60L * nDocs, s"uncapped candidates superlinear: $uncN pairs for $nDocs docs")
  }

  test("10x corpus: sharedSpans df cap suppresses boilerplate cliques; open cap " +
       "finds every clique pair with the exact closed-form run length") {
    // replicas share the ENTIRE base text, so every clique pair's max_run
    // must equal the base token count exactly — closed form, no tolerance.
    // With the cap at 8 every clique shingle (df >= 10) is boilerplate and
    // the output must be EMPTY; at 40 (= 10 replicas x the corpus's
    // natural max base-df of 4) nothing is dropped, so every in-clique
    // pair must surface with an unsplit run.
    val capped = Dedup.sharedSpans(docs10, k = 8, minRun = 20, dfCap = 8)
    assert(capped.count() == 0, "over-cap shingles must be dropped, not joined")

    val open = Dedup.sharedSpans(docs10, k = 8, minRun = 20, dfCap = 40)
    val plan = open.queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "span matching must stay an equi-join at 10x volume")
    val baseTok = Tables.documents(spark, sf01)
      .select((col("doc_id") * 16).as("base"),
              size(split(trim(col("text")), " +")).as("ntok"))
    val clique = open
      .filter(col("ida").divide(16).cast("long") === col("idb").divide(16).cast("long"))
    val eligible = baseTok.filter(col("ntok") >= 20).count()
    assert(clique.count() == 45L * eligible,
      s"expected C(10,2) pairs for each of $eligible eligible cliques")
    val wrongRun = clique
      .join(baseTok, (col("ida") / 16).cast("long") * 16 === col("base"))
      .filter(col("max_run") =!= col("ntok")).count()
    assert(wrongRun == 0, "every clique pair must share exactly the base text run")
  }

  test("10x corpus: connected components converge and every clique stays whole") {
    val capped = Dedup.lshCandidates(minhashSigs, maxBucket = 8)
    // throws if propagation exceeds the round budget — convergence IS the assert
    val comps = Dedup.connectedComponents(capped)
    // every replica of a base doc must land in ONE component: if over-cap
    // buckets were dropped instead of starred, cliques would fragment
    val fragmented = comps
      .withColumn("base", expr("id div 16"))
      .groupBy(col("base")).agg(countDistinct(col("comp")).as("nc"))
      .filter(col("nc") > 1).count()
    assert(fragmented == 0, s"$fragmented replica cliques fragmented by the capped path")
    // and nearly every base doc should be represented (only docs too short
    // to shingle may be absent)
    val basesPresent = comps.select(expr("id div 16")).distinct().count()
    assert(basesPresent >= nDocs / 10 * 9 / 10,
      s"only $basesPresent of ~${nDocs / 10} cliques present in the edge set")
  }

  test("10x corpus: incremental candidates touch only the new batch and stay sublinear vs full") {
    // replicas k==1 play the daily ingest (10% of the corpus); the rest
    // is the already-indexed snapshot
    val idx = Dedup.bandIndex(minhashSigs)
      .withColumn("is_new", col("doc_id") % 16 === 1)
    val inc = Dedup.incrementalCandidatesFlagged(idx, maxBucket = 8).localCheckpoint(true)
    val n = inc.count()
    assert(n > 0, "incremental path found nothing on a corpus of planted cliques")
    // the contract: NO old-vs-old pair is ever re-enumerated (star edges
    // included — they only survive when the member or bucket-min is new)
    val oldOld = inc.filter(col("ida") % 16 =!= 1 && col("idb") % 16 =!= 1).count()
    assert(oldOld == 0, s"$oldOld old-old pairs leaked into the incremental candidates")
    // linear in the NEW batch, not the corpus
    val nNew = docs10.filter(col("doc_id") % 16 === 1).count()
    assert(n <= 30L * nNew, s"incremental candidates superlinear: $n pairs for $nNew new docs")
    // and a strict fraction of the full re-pairing volume — the reason
    // the incremental path exists
    val full = Dedup.lshCandidates(minhashSigs, maxBucket = 8).count()
    assert(n * 2 < full, s"incremental ($n) is not meaningfully below full re-pairing ($full)")
  }

  test("10x corpus: decontamination volume stays linear, plan stays broadcast equi-join") {
    import graft.operators.PipelineOps
    val out = PipelineOps.decontaminate(docs10, col("doc_id") % 97 === 0, width = 4)
    val plan = out.queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "decontamination must stay an equi-join at 10x volume")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "eval shingle set must broadcast")
    val flagged = out.count()
    // every flagged doc is one output row; at 10x the replicas of a
    // contaminated base doc are all contaminated, so the flagged count
    // scales ~linearly with volume, never quadratically
    assert(flagged > 0, "stress corpus produced no contamination — vacuous")
    assert(flagged <= nDocs, s"more flagged docs than docs: $flagged > $nDocs")
  }

  test("10x corpus: chunking output matches the closed-form count, shuffle-free") {
    import graft.operators.PipelineOps
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val (window, stride) = (16, 12)
    val chunks = PipelineOps.chunkDocs(docs10, window, stride)
    // AQE off for the plan assertion: with AQE on, a plan containing any
    // exchange hides inside an AdaptiveSparkPlanExec leaf and the
    // collect below would return empty exactly when a shuffle exists
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val shuffleFree =
      try PipelineOps.chunkDocs(docs10, window, stride)
        .queryExecution.executedPlan
        .collect { case e: ShuffleExchangeExec => e }.isEmpty
      finally spark.conf.set("spark.sql.adaptive.enabled", old)
    assert(shuffleFree, "chunking shuffled data at 10x volume")
    val expected = docs10
      .select(size(split(trim(col("text")), " +")).as("ntok"))
      .agg(sum(ceil(col("ntok").cast("double") / stride)).cast("long")).collect()(0).getLong(0)
    assert(chunks.count() == expected,
      s"chunk count diverged from ceil(ntok/stride) closed form")
  }

  test("10x corpus: training-order preview equals the full-sort reference per shard") {
    import graft.operators.PipelineOps
    import org.apache.spark.sql.expressions.Window
    val (nShards, k) = (16L, 5L)
    val got = PipelineOps.trainingOrder(docs10.select(col("doc_id")), nShards, k, mult = 8L)
      .select(col("shard"), col("position"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val m = 1000000007L
    // brute-force reference: rank EVERY doc per shard (fine in a test)
    val ref = docs10.select(col("doc_id"),
        pmod(col("doc_id") * lit(2654435761L), lit(m)).as("hkey"))
      .withColumn("shard", pmod(col("hkey"), lit(nShards)))
      .withColumn("position", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("hkey"), col("doc_id"))))
      .filter(col("position") <= k)
      .select(col("shard"), col("position"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == ref, "two-pass preview diverged from the full-sort reference")
  }

  test("10x corpus: SimHash banded join overflows buckets and stays equi-join") {
    val sigs = Dedup.simhashSignatures(docs10).localCheckpoint(true)
    val capped = Dedup.simhashPairs(sigs, maxBucket = 8)
    val plan = capped.queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "simhash pairing must stay an equi-join at 10x volume")
    val capN = capped.count()
    val uncN = Dedup.simhashPairs(sigs, maxBucket = Int.MaxValue).count()
    assert(capN > 0, "no simhash pairs at all — star path dropped over-cap buckets?")
    assert(capN < uncN, s"no simhash bucket exceeded the cap (cap=$capN unc=$uncN)")
    assert(capN <= 30L * nDocs, s"capped simhash pairs superlinear: $capN for $nDocs docs")
  }

  // 20 replicas per embedding: k=0 original; k>0 scaled by a positive,
  // index-alternating factor — signs (hence cells) preserved, cosine vs
  // the original ~0.998, so every (base, twin) pair is a true near-dup
  // that MUST surface through the cell path. Shared by the 20x cell test
  // and the bits sweep.
  private lazy val embBase = Tables.embeddings(spark, sf01)
    .select(col("vec_id"), col("embedding"), col("label"))
  private lazy val emb20 = (0 until 20).map { k =>
    if (k == 0) embBase
    else embBase.select((col("vec_id") + lit(k * 1000000L)).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        x * (lit(1.0f) + lit(0.05f * k / 20) *
          when(pmod(i, lit(2)) === 0, lit(1.0f)).otherwise(lit(-1.0f))))
        .as("embedding"),
      col("label"))
  }.reduce(_ unionAll _).localCheckpoint(true)
  private lazy val nBase = embBase.count()

  test("20x embeddings: quantized cells partition exactly; within-cell pairs are " +
       "closed-form-bounded, equi-join planned, and find every planted twin") {
    import graft.operators.Similarity
    val n20 = emb20.count()

    // cells partition the corpus: member counts sum back to corpus size
    val cells = Similarity.quantizedCells(emb20, bits = 8)
      .select(col("cell"), col("n_members")).localCheckpoint(true)
    assert(cells.agg(sum(col("n_members"))).collect()(0).getLong(0) == n20)

    val pairs = Similarity.withinCellPairs(emb20, bits = 8, threshold = -1.0)
    val plan = pairs.queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "within-cell pairing must stay an equi-join at 20x volume")
    // exact closed form: sum over cells of C(n,2) — proves no cross-cell
    // leakage and no within-cell loss
    val expected = cells.agg(sum(col("n_members") * (col("n_members") - 1) / 2))
      .collect()(0).getDouble(0).toLong
    assert(pairs.count() == expected,
      s"pair count != sum-over-cells C(n,2): got ${pairs.count()} want $expected")
    // every planted twin shares its base's cell and cos ~0.998 >= 0.3
    val found = Similarity.withinCellPairs(emb20, bits = 8, threshold = 0.3)
      .filter(col("idb") - col("ida") === 1000000L && col("ida") < 1000000L)
      .count()
    assert(found == nBase, s"only $found/$nBase planted twin pairs surfaced")
  }

  test("SemDeDup bits sweep: raising bits shrinks max-cell share and reducible " +
       "pairs ~2^-Δbits, with zero twin loss at the finest cells") {
    import graft.operators.Similarity
    // "production raises bits" (Similarity scaladoc) as an executed claim:
    // within-cell cost is sum(|cell|^2); each extra sign bit should
    // roughly halve cells. Measured on this corpus the REDUCIBLE pair
    // count (total minus the irreducible same-base 20-clique pairs, which
    // no cell split can separate because replicas preserve signs) drops
    // ~16x per 4 bits — assert >= 8x to leave distribution slack.
    val cliquePairs = nBase * (20L * 19 / 2)
    val stats = Seq(8, 12, 16).map { bits =>
      val r = Similarity.quantizedCells(emb20, bits)
        .agg(max(col("n_members")).as("maxn"),
             sum(col("n_members") * (col("n_members") - 1) / lit(2)).as("pairs"))
        .collect()(0)
      bits -> ((r.getLong(0), r.getDouble(1).toLong - cliquePairs))
    }.toMap
    val (max8, red8) = stats(8)
    val (max12, red12) = stats(12)
    val (max16, red16) = stats(16)
    assert(red8 > 0, "no reducible pairs at bits=8 — sweep corpus vacuous")
    assert(max8 > max12 && max12 >= max16,
      s"max cell members must shrink with bits: $max8 / $max12 / $max16")
    assert(red12 <= red8 / 8, s"bits 8->12 reducible pairs only $red8 -> $red12")
    assert(red16 <= red12 / 8, s"bits 12->16 reducible pairs only $red12 -> $red16")
    // finest cells still hold every planted twin: same-sign scaling keeps
    // each replica in its base's cell at ANY bits, so recall stays 1.0
    val found = Similarity.withinCellPairs(emb20, bits = 16, threshold = 0.3)
      .filter(col("idb") - col("ida") === 1000000L && col("ida") < 1000000L)
      .count()
    assert(found == nBase, s"bits=16 lost twins: $found/$nBase")
  }

  test("10x events: range join stays a hash join and match counts scale exactly 10x") {
    import graft.operators.RangeJoin
    val H = 3600L * 1000000L
    val ev = Tables.events(spark, sf01).select(col("event_id"), col("ts"))
    val ev10 = (0 until 10).map(k =>
      ev.select((col("event_id") * 16 + k).as("event_id"), col("ts")))
      .reduce(_ unionAll _)
    val daily = ev.groupBy(date_trunc("day", col("ts")).as("w_start"))
      .agg(count(lit(1)).as("n"))
    val thr = daily.agg(expr("percentile(n, 0.8)")).head().getDouble(0)
    val hot = daily.filter(col("n") >= thr)
      .select(col("w_start"), (col("w_start") + expr("INTERVAL 1 DAY")).as("w_end"))
    val base = RangeJoin.bucketed(ev, col("ts"), hot,
      col("w_start"), col("w_end"), H).count()
    assert(base > 0, "stress gate vacuous: no event inside a hot window")
    val j10 = RangeJoin.bucketed(ev10, col("ts"), hot,
      col("w_start"), col("w_end"), H)
    val plan = j10.queryExecution.sparkPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      "range join must stay an equi-join at 10x volume")
    // replicas carry identical timestamps, so every base match appears
    // exactly once per replica — the closed-form linearity pin
    assert(j10.count() == base * 10, s"expected ${base * 10}")
  }

  test("10x orders: band join matches the closed form and stays a hash join") {
    import graft.operators.RangeJoin
    val o = Tables.orders(spark, sf01)
      .select(col("o_orderkey"), col("o_totalprice"))
    def pairs(df: org.apache.spark.sql.DataFrame) = RangeJoin.band(
      df.select(col("o_orderkey").as("ida"), col("o_totalprice").as("pa")),
      col("pa"),
      df.select(col("o_orderkey").as("idb"), col("o_totalprice").as("pb")),
      col("pb"), delta = 0.05)
      .filter(col("ida") < col("idb"))
    val base = pairs(o).count()
    assert(base > 0, "band stress vacuous at this SF/delta")
    val o10 = (0 until 10).map(k =>
      o.select((col("o_orderkey") * 16 + k).as("o_orderkey"), col("o_totalprice")))
      .reduce(_ unionAll _)
    val j10 = pairs(o10)
    assert(!j10.queryExecution.sparkPlan.toString.contains("NestedLoop"),
      "band join must stay an equi-join at 10x volume")
    // replicas keep identical prices: every base pair appears 10x10
    // times across replica combinations, and each order gains C(10,2)
    // zero-diff pairs among its own copies — the exact closed form
    assert(j10.count() == base * 100 + o.count() * 45,
      s"expected ${base * 100 + o.count() * 45}")
  }

  test("10x intervals: overlap join scales exactly linearly, one row per pair") {
    import graft.operators.RangeJoin
    val H = 3600L * 1000000L
    // left: per-user session-like intervals from the events sliver
    val sess = Tables.events(spark, sf01)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
      .agg(min(col("ts")).as("s_start"),
           (max(col("ts")) + expr("INTERVAL 30 MINUTE")).as("s_end"))
    val hot = Tables.events(spark, sf01)
      .groupBy(date_trunc("day", col("ts")).as("w_start"))
      .agg(count(lit(1)).as("n"))
      .select(col("w_start"), (col("w_start") + expr("INTERVAL 1 DAY")).as("w_end"))
    val base = RangeJoin.overlaps(sess, col("s_start"), col("s_end"),
      hot, col("w_start"), col("w_end"), H).count()
    assert(base > 0, "overlap stress vacuous at this SF")
    val sess10 = (0 until 10).map(k =>
      sess.select((col("user_id") * 16 + k).as("user_id"),
        col("d"), col("s_start"), col("s_end")))
      .reduce(_ unionAll _)
    val j10 = RangeJoin.overlaps(sess10, col("s_start"), col("s_end"),
      hot, col("w_start"), col("w_end"), H)
    assert(!j10.queryExecution.sparkPlan.toString.contains("NestedLoop"),
      "overlap join must stay an equi-join at 10x volume")
    // identical interval bounds per replica: every base overlap appears
    // exactly once per replica — linearity AND the no-duplicate rule
    assert(j10.count() == base * 10, s"expected ${base * 10}")
  }

  test("20-deep delta stack: readMerged stays ONE window pass and folds flat") {
    import graft.acid.Versioned
    val base = java.nio.file.Files.createTempDirectory("graft_ver_stack")
      .toString + "/t"
    val src = Tables.orders(spark, sf01)
      .select(col("o_orderkey"), col("o_totalprice"))
    Versioned.commit(spark, base, src)
    // 20 delta commits, each touching a disjoint 500-key slice — the
    // daily-upsert regime a 100 TB table actually lives in
    (0 until 20).foreach { k =>
      Versioned.commitDelta(spark, base, Seq("o_orderkey"),
        upserts = src.filter(col("o_orderkey") % 40 === k)
          .withColumn("o_totalprice", col("o_totalprice") + k))
    }
    val merged = Versioned.readMerged(spark, base, Seq("o_orderkey"))
    // one window resolves the whole stack — the merge cost is a single
    // shuffle-by-key regardless of delta count, never one join per delta;
    // Spark additionally plants a PARTIAL WindowGroupLimit below the
    // exchange, so losers are pruned map-side before they shuffle
    val plan = merged.queryExecution.executedPlan.toString
    assert("Window \\[row_number".r.findAllIn(plan).length == 1, plan.take(1200))
    assert(plan.contains("WindowGroupLimit"), "map-side top-1 prune missing")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "delta merge must not plan joins")
    val rows = merged.count()
    assert(rows == src.count(), s"merge lost/duplicated keys: $rows")
    // compaction returns the table to plain-scan reads with same content
    Versioned.compactDeltas(spark, base, Seq("o_orderkey"))
    assert(Versioned.read(spark, base).count() == rows)
    val sumMerged = Versioned.read(spark, base)
      .agg(sum(col("o_totalprice").cast("decimal(25,2)"))).head().getDecimal(0)
    val sumExpect = src
      .withColumn("o_totalprice",
        col("o_totalprice") + when(col("o_orderkey") % 40 < 20,
          col("o_orderkey") % 40).otherwise(0))
      .agg(sum(col("o_totalprice").cast("decimal(25,2)"))).head().getDecimal(0)
    assert(sumMerged.compareTo(sumExpect) == 0,
      s"content drift after 20-delta fold: $sumMerged vs $sumExpect")
  }

  test("10x corpus: line-boilerplate drops scale exactly linearly and survive repartitioning") {
    import spark.implicits._
    // closed form: D docs, each with one shared boilerplate line (df = D)
    // and two unique lines; at minDf = 3 exactly one line per doc drops
    def corpus(d: Int) = (0 until d).flatMap { i =>
      Seq((i.toLong, 0, "SHARED BANNER LINE"),
          (i.toLong, 1, s"unique a $i"),
          (i.toLong, 2, s"unique b $i"))
    }.toDF("doc_id", "idx", "line")
    def dropped(df: org.apache.spark.sql.DataFrame) =
      graft.operators.PipelineOps
        .lineBoilerplateScrub(df, "doc_id", "idx", "line", minDf = 3)
        .agg(sum("n_dropped"), sum("n_kept")).head()
    val small = dropped(corpus(50))
    val big = dropped(corpus(500))
    assert(small.getLong(0) == 50 && small.getLong(1) == 100)
    assert(big.getLong(0) == 500 && big.getLong(1) == 1000, "drops must scale exactly 10x")
    // partitioning invariance: the reassembled text is identical under a
    // hostile repartition (order comes from idx, not arrival order)
    val a = graft.operators.PipelineOps
      .lineBoilerplateScrub(corpus(50), "doc_id", "idx", "line", 3)
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    val b = graft.operators.PipelineOps
      .lineBoilerplateScrub(corpus(50).repartition(17, col("line")), "doc_id", "idx", "line", 3)
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    assert(a == b, "clean_text must not depend on physical row order")
  }

  test("10x events: resample grid size is REPORT-sized, not data-sized; fills stay exact") {
    import graft.operators.EventsOps
    val base = Tables.events(spark, sf01).select(col("event_type"), col("ts"), col("value"))
    // 10x volume inside the same time span: replicas shift by < 1 bucket
    val dense = (0 until 10).map(k =>
      base.withColumn("value", col("value") + lit(k * 0.01))).reduce(_ unionAll _)
    val g1 = EventsOps.resample(base, col("event_type"), col("ts"), col("value"), 3600L)
    val g10 = EventsOps.resample(dense, col("event_type"), col("ts"), col("value"), 3600L)
    val (n1, n10) = (g1.count(), g10.count())
    // the whole point: 10x the events, IDENTICAL grid cardinality
    assert(n1 == n10, s"grid grew with data volume: $n1 -> $n10")
    // fills still exact: zero-filled rows are exactly the empty buckets
    // and event counts scale exactly 10x
    val e1 = g1.agg(sum(col("n"))).collect()(0).getLong(0)
    val e10 = g10.agg(sum(col("n"))).collect()(0).getLong(0)
    assert(e10 == 10 * e1, s"bucket event counts must scale 10x: $e1 -> $e10")
    assert(g10.filter(col("n") === 0 && col("v_zero") =!= 0d).count() == 0)
  }

  test("weighted sample selects the identical row set under any partitioning (no rand())") {
    import spark.implicits._
    val base = (0 until 2000).map(i => (i.toLong, (i % 97) / 100.0)).toDF("doc_id", "p")
    def ids(df: org.apache.spark.sql.DataFrame) =
      graft.operators.PipelineOps.weightedSample(df, "doc_id", "p")
        .select("doc_id").as[Long].collect().toSet
    val s1 = ids(base)
    val s2 = ids(base.repartition(13))
    assert(s1 == s2, "hash-threshold selection must be partitioning-invariant")
    assert(s1.nonEmpty && s1.size < 2000, s"degenerate selection: ${s1.size}")
    // monotone in p: doubling every probability only ADDS rows
    val boosted = graft.operators.PipelineOps
      .weightedSample(base.withColumn("p", least(lit(1.0), col("p") * 2)), "doc_id", "p")
      .select("doc_id").as[Long].collect().toSet
    assert(s1.subsetOf(boosted), "raising p must never evict a selected row")
  }
}
