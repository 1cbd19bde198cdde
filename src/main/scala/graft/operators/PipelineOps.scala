package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Training-data pipeline operators beyond dedup/similarity: context-
  * window token packing, PII-style redaction, Gopher-style repetition
  * signals, deterministic stratified sampling, token-window chunking,
  * reproducible training-order sharding, and benchmark decontamination.
  * Scale notes per op in the scaladocs; all are zero- to two-shuffle
  * plans keyed on high-cardinality columns (doc_id / source / stratum),
  * no driver loops.
  */
object PipelineOps {

  /** Context-window packing: assign documents to fixed token-budget bins
    * (training batch construction). Packing is OFFSET-BASED — bin =
    * floor(preceding-token-count / budget) within each source, the
    * standard scalable formulation (documents may straddle a boundary;
    * sequence builders split them downstream).
    *
    * Scale shape: the running token sum is a TWO-PASS PREFIX SUM, not a
    * per-source window. `source` is low-cardinality, so a window
    * partitioned on it alone funnels an entire source's corpus through
    * one sort task at 100 TB. Instead doc_id space is cut into
    * order-aligned chunks (a cheap pruned min/max pass sizes them), the
    * running sum is computed per (source, chunk) — every window
    * partition is a bounded slice — and per-chunk subtotals (metadata-
    * sized: <= targetChunks rows per source) are prefix-summed and
    * broadcast back as additive offsets. One full-data exchange total;
    * the source-only window runs over the aggregated subtotal table. */
  val q132_token_packing: Q = (s, d) => {
    val budget = 256
    val targetChunks = 2048L
    // metadata pass: doc_id bounds from a single pruned column — sizes
    // the chunks so the count is stable regardless of id sparsity
    val boundsRow = Tables.documents(s, d)
      .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      .collect()(0)
    val lo = if (boundsRow.isNullAt(0)) 0L else boundsRow.getLong(0)
    val span = if (boundsRow.isNullAt(1)) 1L else boundsRow.getLong(1) - lo + 1L
    val chunkSize = math.max(1L, (span + targetChunks - 1L) / targetChunks)
    val chunked = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), " +")).as("ntok"))
      // integer `div`: exact for 64-bit ids (a double floor() is not)
      .withColumn("chunk", expr(s"(doc_id - ${lo}L) div ${chunkSize}L"))
    val localWin = Window.partitionBy(col("source"), col("chunk"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val localled = chunked.withColumn("lcum", sum(col("ntok")).over(localWin))
    // per-(source, chunk) subtotals -> exclusive prefix sum over chunks.
    // This source-only window is over the AGGREGATED table (metadata-
    // sized), which is the whole point of the two-pass formulation.
    // Subtotals come from the PRE-window rows (sum(ntok) == max(lcum) by
    // construction): aggregating the windowed table instead would force
    // the full-corpus sort+window to execute a second time just to feed
    // the broadcast build.
    val offsets = chunked
      .groupBy(col("source"), col("chunk"))
      .agg(sum(col("ntok")).as("subtotal"))
      .withColumn("offset", coalesce(
        sum(col("subtotal")).over(
          Window.partitionBy(col("source")).orderBy(col("chunk"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("source"), col("chunk"), col("offset"))
    localled.join(broadcast(offsets), Seq("source", "chunk"))
      .withColumn("cum", col("lcum") + col("offset"))
      .withColumn("bin", floor((col("cum") - col("ntok")) / lit(budget.toDouble)).cast("bigint"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).cast("bigint").as("bin_tokens"))
      .orderBy(col("source"), col("bin"))
  }

  /** PII-style redaction: mask digit runs in the event props payload,
    * count redactions per event type. Pure scan-side projection
    * (regexp_replace/extract_all are codegen'd) — streams at scan speed;
    * the aggregate is a low-cardinality rollup for the audit report. */
  val q133_pii_redaction: Q = (s, d) => {
    Tables.events(s, d)
      .select(col("event_type"), col("props"),
        regexp_replace(col("props"), "[0-9]+", "#").as("redacted"),
        size(expr("regexp_extract_all(props, '[0-9]+', 0)")).as("n_hits"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("n_hits")).cast("bigint").as("digits_redacted"),
        countDistinct(col("redacted")).as("distinct_shapes"))
      .orderBy(col("event_type"))
  }

  /** Gopher-style repetition signals per document: duplicate-unigram
    * ratio, top-token share, duplicate-bigram ratio. Every signal is a
    * function of ONE document's own token array, so the whole row is a
    * scan-side projection — no explode, no shuffle, no join (the r14
    * shape paid two explode+double-aggregation lanes joined on doc_id:
    * four exchanges for per-row arithmetic; guide §2.4 "remove shuffles
    * outright"). ntok/ndistinct/nbg/nbgd come from size/array_distinct;
    * the top-token count is a fold over the SORTED token array (max run
    * of equal neighbors == max multiplicity — same integers the old
    * groupBy counted, so the rounded doubles are bit-identical). The
    * only ordering is the presentation ORDER BY. Docs with < 2 tokens
    * are excluded exactly as before (the bigram lane's filter, which the
    * old inner join propagated to the whole row). spread: per-row work
    * (sort + distinct over the token array) dominates on the
    * single-row-group fixture (§2.5); no-op at real scale. */
  val q134_repetition: Q = (s, d) => {
    val docs = Tables.spread(Tables.documents(s, d), col("doc_id"))
    val topcnt = expr(
      """aggregate(
        |  array_sort(ts),
        |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'mx', 0L),
        |  (acc, x) -> named_struct(
        |    'prev', x,
        |    'run', IF(x <=> acc.prev, acc.run + 1L, 1L),
        |    'mx', GREATEST(acc.mx, IF(x <=> acc.prev, acc.run + 1L, 1L))),
        |  acc -> acc.mx)""".stripMargin)
    docs
      .withColumn("ts", split(trim(col("text")), " +"))
      .filter(size(col("ts")) >= 2)
      .select(col("doc_id"),
        size(col("ts")).cast("double").as("ntok"),
        size(array_distinct(col("ts"))).cast("double").as("ndistinct"),
        topcnt.cast("double").as("topcnt"),
        (size(col("ts")) - 1).cast("double").as("nbg"),
        size(array_distinct(expr(
          "transform(sequence(0, size(ts) - 2), i -> concat_ws(' ', ts[i], ts[i+1]))")))
          .cast("double").as("nbgd"))
      .select(col("doc_id"),
        round(lit(1.0) - col("ndistinct") / col("ntok"), 6).as("dup_unigram_ratio"),
        round(col("topcnt") / col("ntok"), 6).as("top_token_share"),
        round(lit(1.0) - col("nbgd") / col("nbg"), 6).as("dup_bigram_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic stratified sampling: an exact per-stratum quota taken
    * in multiplicative-hash order (Knuth constant), so the sample is
    * reproducible across runs, engines, and cluster layouts — no RNG.
    *
    * Scale shape: TWO-PASS. Pass 1 counts each stratum (pruned two-
    * column scan, map-side partials) and derives a hash cutoff that
    * keeps ~mult*quota rows per stratum. Pass 2 rank-sorts only the
    * survivors — the per-stratum window sees ~200 rows, never the whole
    * stratum (the full-stratum sort was the 100 TB killer). The cutoff
    * keeps a SUPERSET of the true quota-smallest hashes whenever
    * survivors >= min(quota, n), so the trimmed result is bit-identical
    * to the one-pass rank; a Chernoff bound puts under-fill below
    * e^-50 per stratum at mult=4, and a raise_error guard turns that
    * case into a loud failure (re-run with a higher mult), never a
    * silently short sample. */
  val q135_stratified_sample: Q = (s, d) => {
    val quota = 50
    val mult = 4L
    val m = 1000000007L
    val hkey = pmod(col("doc_id") * lit(2654435761L), lit(m))
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), hkey.as("hkey"))
    val rates = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .withColumn("cutoff",
        when(col("n") <= lit(mult * quota), lit(m.toDouble))
          .otherwise(lit((mult * quota * m).toDouble) / col("n") + lit(1.0)))
    val pre = docs.join(broadcast(rates), Seq("lang"))
      .filter(col("hkey") < col("cutoff"))
    pre
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("hkey"), col("doc_id"))))
      .withColumn("survivors", count(lit(1)).over(Window.partitionBy(col("lang"))))
      // the guard lives in the filter so column pruning can't drop it
      .filter(
        when(col("survivors") < least(lit(quota.toLong), col("n")),
          raise_error(concat(lit("q135_stratified_sample: stratum "), col("lang"),
            lit(" under-filled by the hash pre-filter; raise mult"))).cast("boolean"))
        .otherwise(col("rn") <= lit(quota)))
      .select(col("lang"), col("rn"), col("doc_id"))
      .orderBy(col("lang"), col("rn"))
  }

  /** Token-window document chunking with overlap (sequence construction
    * for training): window=16 tokens, stride=12, so consecutive chunks
    * share 4 tokens. Pure per-row explode — tokenize, generate start
    * offsets, slice — no shuffle anywhere except the presentation
    * ORDER BY; streams at scan speed and parallelizes by input split at
    * any corpus size. */
  def chunkDocs(docs: org.apache.spark.sql.DataFrame,
                window: Int, stride: Int): org.apache.spark.sql.DataFrame =
    docs
      .withColumn("ts", split(trim(col("text")), " +"))
      .withColumn("ntok", size(col("ts")))
      .select(col("doc_id"), col("ts"), col("ntok"),
        explode(expr(s"sequence(1, ntok, $stride)")).as("st"))
      .select(col("doc_id"), col("st"),
        expr(s"slice(ts, st, $window)").as("chunk"))
      .select(col("doc_id"), col("st"),
        size(col("chunk")).as("chunk_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))

  val q146_doc_chunking: Q = (s, d) =>
    chunkDocs(Tables.documents(s, d), window = 16, stride = 12)
      .orderBy(col("doc_id"), col("st"))

  /** Deterministic training-order shard assignment: shard =
    * multiplicative-hash bucket, order within shard = hash order — a
    * reproducible global shuffle with no RNG (the property training
    * pipelines need for resumable, engine-independent data ordering).
    *
    * Scale shape: the per-shard counts aggregate without windows, and the
    * order PREVIEW (first k docs per shard) reuses q135's two-pass trick —
    * a broadcast hash cutoff keeps ~mult*k candidates per shard, so the
    * shard-partitioned rank window sees a bounded sliver, never a full
    * shard (shards are few: the full-shard window would be the q132
    * anti-pattern). The full training order is never materialized as a
    * ranked table at scale — the writer emits
    * repartition(shard).sortWithinPartitions(hkey) files; rank is only
    * computed here on the preview sliver where it is the observable. */
  def trainingOrder(src: org.apache.spark.sql.DataFrame,
                    nShards: Long, k: Long, mult: Long): org.apache.spark.sql.DataFrame = {
    val m = 1000000007L
    val docs = src
      .select(col("doc_id"),
        pmod(col("doc_id") * lit(2654435761L), lit(m)).as("hkey"))
      .withColumn("shard", pmod(col("hkey"), lit(nShards)))
    val stats = docs.groupBy(col("shard")).agg(count(lit(1)).as("n_in_shard"))
      .withColumn("cutoff",
        when(col("n_in_shard") <= lit(mult * k), lit(m.toDouble))
          .otherwise(lit((mult * k * m).toDouble) / col("n_in_shard") + lit(1.0)))
    docs.join(broadcast(stats), Seq("shard"))
      .filter(col("hkey") < col("cutoff"))
      .withColumn("position", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("hkey"), col("doc_id"))))
      .withColumn("survivors", count(lit(1)).over(Window.partitionBy(col("shard"))))
      .filter(
        when(col("survivors") < least(lit(k), col("n_in_shard")),
          raise_error(concat(lit("q147_training_order: shard "), col("shard"),
            lit(" under-filled by the hash pre-filter; raise mult"))).cast("boolean"))
        .otherwise(col("position") <= lit(k)))
      .select(col("shard"), col("position"), col("doc_id"), col("n_in_shard"))
  }

  val q147_training_order: Q = (s, d) =>
    trainingOrder(Tables.documents(s, d), nShards = 16L, k = 5L, mult = 8L)
      .orderBy(col("shard"), col("position"))

  /** Benchmark decontamination: flag training documents sharing any
    * 4-token shingle with the held-out eval slice (here: doc_id % 97 == 0,
    * standing in for a benchmark suite; production uses 8-13-gram windows —
    * 4 matches this fixture's vocabulary so the overlap path actually
    * exercises, rather than passing on an empty result). The real-world asymmetry does the
    * heavy lifting: the eval side is tiny, so its distinct shingle set
    * BROADCASTS and the train side never shuffles — one scan-side
    * explode + broadcast semi-style join + doc_id re-aggregate (partial
    * aggs map-side). At 100 TB the eval shingle set rides along as a
    * broadcast (or a bloom filter in front of it); train-side cost stays
    * one pass. */
  def decontaminate(docs: org.apache.spark.sql.DataFrame,
                    isEval: org.apache.spark.sql.Column,
                    width: Int): org.apache.spark.sql.DataFrame = {
    def shingles(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("ts", split(trim(col("text")), " +"))
      .filter(size(col("ts")) >= width)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(ts) - ${width - 1}), i -> array_join(slice(ts, i, $width), ' '))"))
        .as("sh"))
    val evalSh = shingles(docs.filter(isEval)).select(col("sh")).distinct()
    shingles(docs.filter(!isEval))
      .join(broadcast(evalSh), Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("sh")).as("n_overlap"))
  }

  val q148_decontamination: Q = (s, d) =>
    decontaminate(Tables.documents(s, d), col("doc_id") % 97 === 0, width = 4)
      .orderBy(col("doc_id"))

  /** Curriculum mixing: sample each language toward a target mixture
    * share under a document budget. The plan (per-lang target, capped
    * sampling rate) is an aggregate sliver joined to a tiny weights
    * table; membership is a deterministic hash-mod gate on doc_id
    * (reproducible across runs/cluster layouts — no rand()). At 100 TB
    * the weights and plan broadcast; the corpus pass is one scan with a
    * codegen'd filter. Mirrors how training mixes (e.g. The Pile /
    * Gopher-style source weights) are materialized. */
  val q177_source_mixing: Q = (s, d) => {
    import s.implicits._
    val weights = Seq(("en", 0.5), ("de", 0.2), ("fr", 0.1), ("es", 0.1), ("zh", 0.1))
      .toDF("w_lang", "share")
    val docs = Tables.documents(s, d)
    val plan = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_avail"))
      .join(weights, col("lang") === col("w_lang"))
      .select(col("lang").as("p_lang"), col("n_avail"),
              floor(lit(200) * col("share")).cast("long").as("n_target"))
      .withColumn("thr", floor(
        least(lit(1.0), col("n_target").cast("double") / col("n_avail")) * 10000))
    docs.join(broadcast(plan), col("lang") === col("p_lang"))
      .groupBy(col("lang"), col("n_avail"), col("n_target"))
      .agg(count(when((col("doc_id") * 2654435761L) % 10000 < col("thr"), 1))
        .as("n_sampled"))
      .orderBy(col("lang"))
  }

  /** Leakage-safe train/val/test split: the split key is a hash of the
    * SOURCE, not the document, so every document from one source lands
    * in the same split — the group-aware assignment that stops
    * near-duplicates within a source from straddling train and eval
    * (the classic contamination vector a doc-level split leaves open).
    * Assignment is the first two hex chars of md5(source || salt)
    * compared against range boundaries ('e6' ≈ 90%, 'f3' ≈ 95%) —
    * byte-identical in any engine with a standard md5, which is what
    * makes the DuckDB oracle exact, and reproducible forever from the
    * salt alone (no rand(), no state). One scan, one small aggregate;
    * the split column itself is a codegen'd projection — scan-speed at
    * any corpus size. */
  def splitAssign(docs: DataFrame, groupCol: String,
                  salt: String = "graft-split-v1"): DataFrame = {
    val pfx = substring(md5(concat(col(groupCol).cast("string"), lit("|" + salt))), 1, 2)
    docs.withColumn("split",
      when(pfx < "e6", "train").when(pfx < "f3", "val").otherwise("test"))
  }

  /** One row per (split, source): the complete assignment is hash-pinned,
    * and group-awareness is visible in the result itself — a source
    * appearing under two splits would change the row set. */
  val q262_group_split: Q = (s, d) =>
    splitAssign(Tables.documents(s, d), "source")
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(length(col("text"))).as("sum_chars"))
      .orderBy(col("split"), col("source"))

  /** CCNet/RefinedWeb-style LINE-level boilerplate removal: a line that
    * recurs across >= minDf distinct documents is boilerplate (headers,
    * navigation, license banners) and is excised from every document;
    * survivors rejoin in original order. The span/ngram dedup family
    * (q215/q148) works on shingles — this is its line-granularity
    * sibling, the first scrub CCNet applies before anything else.
    *
    * Input contract: (docCol, idxCol, lineCol) — one row per line with
    * its position. Plan shape: one map-combinable GROUP BY line for the
    * df sliver (boilerplate is by definition a small set), broadcast
    * LEFT ANTI join back (corpus never reshuffled on the line key for
    * the scrub itself), one GROUP BY doc to reassemble. At 100 TB the
    * only full-corpus shuffle is the final per-doc regroup. */
  def lineBoilerplateScrub(lines: DataFrame, docCol: String, idxCol: String,
                           lineCol: String, minDf: Long): DataFrame = {
    val boiler = lines
      .filter(trim(col(lineCol)) =!= "")
      .groupBy(col(lineCol))
      .agg(countDistinct(col(docCol)).as("df"))
      .filter(col("df") >= minDf)
      .select(col(lineCol))
    // flag-then-aggregate: ONE broadcast join + ONE doc-key shuffle. (An
    // anti join would drop boilerplate rows and need a second full
    // per-doc count plus a join to resurrect all-boilerplate docs.)
    val flagged = lines.join(
      broadcast(boiler.withColumn("_boiler", lit(true))), Seq(lineCol), "left")
    flagged
      .groupBy(col(docCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              when(col("_boiler").isNull, struct(col(idxCol), col(lineCol))))),
            s => s.getField(lineCol)),
          "\n").as("clean_text"),
        count(when(col("_boiler").isNull, 1)).as("n_kept"),
        count(when(col("_boiler"), 1)).as("n_dropped"))
  }

  /** Quality-proportional Bernoulli downsampling (the DCLM/CCNet-style
    * "keep high-quality data with higher probability" resampler):
    * document d survives iff U(d) < p(d), where U(d) is a uniform
    * [0,1) DERIVED FROM A HASH (first 8 hex of md5(id || salt) / 2^32)
    * and p(d) is the caller's per-row probability column. No rand(),
    * no state: the decision is a pure codegen'd projection, reproducible
    * forever from the salt, identical on any engine with a standard md5
    * — which is what lets DuckDB replay the exact selection, and what
    * makes reruns/backfills at 100 TB pick the same rows. */
  def weightedSample(docs: DataFrame, idCol: String, pCol: String,
                     salt: String = "graft-wsample-v1"): DataFrame = {
    val u = conv(substring(md5(concat(col(idCol).cast("string"), lit("|" + salt))), 1, 8),
                 16, 10).cast("double") / lit(4294967296.0)
    docs.filter(u < col(pCol))
  }

  /** Gate row: survival probability rises with quality proxy (rare-word
    * ratio stand-in: chars-per-word scaled into [0.2, 0.9]); the oracle
    * recomputes the md5 threshold decision bit-for-bit in DuckDB. */
  val q266_weighted_sample: Q = (s, d) => {
    val base = Tables.documents(s, d)
      .withColumn("p_keep", least(lit(0.9),
        greatest(lit(0.2), (col("n_chars") / size(split(col("text"), " ")) - 3.0) / 5.0)))
    weightedSample(base, "doc_id", "p_keep")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
           sum(length(col("text"))).as("kept_chars"))
      .orderBy(col("source"))
  }

  /** Gate row: documents reflowed into 4-word lines (pure projection —
    * transform over sequence, no shuffle), then scrubbed at df >= 3.
    * Non-vacuous at sf0.01: 47 distinct boilerplate lines hit 500 docs. */
  val q265_line_boilerplate: Q = (s, d) => {
    val reflow = Tables.spread(Tables.documents(s, d), col("doc_id"))
      .withColumn("w", split(col("text"), " "))
      .select(col("doc_id"),
        posexplode(expr(
          "filter(transform(sequence(0, cast(ceil(size(w)/4.0) as int) - 1)," +
            " i -> array_join(slice(w, i*4+1, 4), ' ')), x -> x != '')"))
          .as(Seq("idx", "line")))
    lineBoilerplateScrub(reflow, "doc_id", "idx", "line", minDf = 3)
      .select(col("doc_id"), col("clean_text"),
        col("n_kept").cast("long").as("n_kept"),
        col("n_dropped").cast("long").as("n_dropped"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "q177_source_mixing" -> q177_source_mixing,
    "q262_group_split" -> q262_group_split,
    "q265_line_boilerplate" -> q265_line_boilerplate,
    "q266_weighted_sample" -> q266_weighted_sample,
    "q132_token_packing" -> q132_token_packing,
    "q133_pii_redaction" -> q133_pii_redaction,
    "q134_repetition" -> q134_repetition,
    "q135_stratified_sample" -> q135_stratified_sample,
    "q146_doc_chunking" -> q146_doc_chunking,
    "q147_training_order" -> q147_training_order,
    "q148_decontamination" -> q148_decontamination,
  )

  val oracles: Map[String, String] = Map(
    "q266_weighted_sample" ->
      """WITH scored AS (
        |  SELECT *, LEAST(0.9, GREATEST(0.2,
        |    (n_chars / len(string_split(text, ' ')) - 3.0) / 5.0)) AS p_keep
        |  FROM documents
        |)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |       CAST(SUM(LENGTH(text)) AS BIGINT) AS kept_chars
        |FROM scored
        |WHERE ('0x' || substr(md5(doc_id || '|graft-wsample-v1'), 1, 8))::BIGINT
        |      / 4294967296.0 < p_keep
        |GROUP BY source ORDER BY source""".stripMargin,
    "q265_line_boilerplate" ->
      """WITH words AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), tok AS (
        |  SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS pos FROM words
        |), lines AS (
        |  SELECT doc_id, CAST(floor((pos - 1) / 4) AS INT) AS idx,
        |         string_agg(word, ' ' ORDER BY pos) AS line
        |  FROM tok GROUP BY doc_id, CAST(floor((pos - 1) / 4) AS INT)
        |  HAVING string_agg(word, ' ' ORDER BY pos) <> ''
        |), boiler AS (
        |  SELECT line FROM lines WHERE trim(line) <> ''
        |  GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 3
        |)
        |SELECT l.doc_id,
        |  COALESCE(string_agg(CASE WHEN b.line IS NULL THEN l.line END,
        |                      chr(10) ORDER BY l.idx), '') AS clean_text,
        |  COUNT(CASE WHEN b.line IS NULL THEN 1 END) AS n_kept,
        |  COUNT(CASE WHEN b.line IS NOT NULL THEN 1 END) AS n_dropped
        |FROM lines l LEFT JOIN boiler b ON l.line = b.line
        |GROUP BY l.doc_id
        |ORDER BY l.doc_id""".stripMargin,
    "q262_group_split" ->
      """WITH a AS (
        |  SELECT *, CASE
        |    WHEN substr(md5(CAST(source AS VARCHAR) || '|graft-split-v1'), 1, 2) < 'e6'
        |      THEN 'train'
        |    WHEN substr(md5(CAST(source AS VARCHAR) || '|graft-split-v1'), 1, 2) < 'f3'
        |      THEN 'val'
        |    ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, source, COUNT(1) AS n_docs,
        |  CAST(SUM(length(text)) AS BIGINT) AS sum_chars
        |FROM a GROUP BY split, source ORDER BY split, source""".stripMargin,
    "q177_source_mixing" ->
      """WITH w AS (
        |  SELECT * FROM (VALUES ('en', 0.5), ('de', 0.2), ('fr', 0.1),
        |                        ('es', 0.1), ('zh', 0.1)) AS t(w_lang, share)),
        |plan AS (
        |  SELECT lang, COUNT(1) AS n_avail,
        |    CAST(FLOOR(200 * share) AS BIGINT) AS n_target,
        |    FLOOR(LEAST(1.0, CAST(CAST(FLOOR(200 * share) AS BIGINT) AS DOUBLE)
        |                      / COUNT(1)) * 10000) AS thr
        |  FROM documents JOIN w ON lang = w_lang
        |  GROUP BY lang, share)
        |SELECT d.lang, n_avail, n_target,
        |  COUNT(CASE WHEN (d.doc_id * 2654435761) % 10000 < thr THEN 1 END) AS n_sampled
        |FROM documents d JOIN plan p ON d.lang = p.lang
        |GROUP BY d.lang, n_avail, n_target ORDER BY d.lang""".stripMargin,
    "q132_token_packing" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    len(regexp_split_to_array(trim(text), ' +')) AS ntok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, ntok,
        |    SUM(ntok) OVER (PARTITION BY source ORDER BY doc_id
        |                    ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT source, CAST(FLOOR((cum - ntok) / 256.0) AS BIGINT) AS bin,
        |  COUNT(1) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS bin_tokens
        |FROM c GROUP BY source, bin ORDER BY source, bin""".stripMargin,
    "q133_pii_redaction" ->
      """SELECT event_type, COUNT(1) AS n_events,
        |  CAST(SUM(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT) AS digits_redacted,
        |  COUNT(DISTINCT regexp_replace(props, '[0-9]+', '#', 'g')) AS distinct_shapes
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q134_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), ' +')) AS tok
        |  FROM documents),
        |uni AS (
        |  SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS ntok,
        |    CAST(COUNT(1) AS DOUBLE) AS ndistinct, CAST(MAX(c) AS DOUBLE) AS topcnt
        |  FROM (SELECT doc_id, tok, COUNT(1) AS c FROM toks GROUP BY doc_id, tok)
        |  GROUP BY doc_id),
        |bgs AS (
        |  SELECT doc_id, unnest([s[i] || ' ' || s[i+1] for i in range(1, len(s))]) AS bg
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS s FROM documents)
        |  WHERE len(s) >= 2),
        |bi AS (
        |  SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS nbg,
        |    CAST(COUNT(1) AS DOUBLE) AS nbgd
        |  FROM (SELECT doc_id, bg, COUNT(1) AS c FROM bgs GROUP BY doc_id, bg)
        |  GROUP BY doc_id)
        |SELECT uni.doc_id,
        |  round(1.0 - ndistinct / ntok, 6) AS dup_unigram_ratio,
        |  round(topcnt / ntok, 6) AS top_token_share,
        |  round(1.0 - nbgd / nbg, 6) AS dup_bigram_ratio
        |FROM uni JOIN bi ON uni.doc_id = bi.doc_id
        |ORDER BY uni.doc_id""".stripMargin,
    "q135_stratified_sample" ->
      """WITH h AS (
        |  SELECT doc_id, lang, (doc_id * 2654435761) % 1000000007 AS hkey
        |  FROM documents),
        |r AS (
        |  SELECT lang, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hkey, doc_id) AS rn
        |  FROM h)
        |SELECT lang, rn, doc_id FROM r WHERE rn <= 50
        |ORDER BY lang, rn""".stripMargin,
    "q146_doc_chunking" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS s
        |  FROM documents),
        |st AS (
        |  SELECT doc_id, s, unnest(range(1, len(s) + 1, 12)) AS st
        |  FROM t)
        |SELECT doc_id, CAST(st AS INT) AS st,
        |  CAST(len(s[st:st+15]) AS INT) AS chunk_tokens,
        |  array_to_string(s[st:st+15], ' ') AS chunk_text
        |FROM st ORDER BY doc_id, st""".stripMargin,
    "q147_training_order" ->
      """WITH h AS (
        |  SELECT doc_id, (doc_id * 2654435761) % 1000000007 AS hkey
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, hkey, hkey % 16 AS shard FROM h),
        |r AS (
        |  SELECT shard, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY shard ORDER BY hkey, doc_id) AS position,
        |    COUNT(1) OVER (PARTITION BY shard) AS n_in_shard
        |  FROM sh)
        |SELECT shard, CAST(position AS INT) AS position, doc_id, n_in_shard
        |FROM r WHERE position <= 5
        |ORDER BY shard, position""".stripMargin,
    "q148_decontamination" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    unnest([array_to_string(s[i:i+3], ' ') for i in range(1, len(s) - 2)]) AS sh
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS s
        |        FROM documents)
        |  WHERE len(s) >= 4),
        |ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0)
        |SELECT doc_id, COUNT(DISTINCT s.sh) AS n_overlap
        |FROM sh s JOIN ev ON s.sh = ev.sh
        |WHERE s.doc_id % 97 <> 0
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
  )
}
