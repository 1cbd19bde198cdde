package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Training-data pipeline operators beyond dedup/similarity: context-
  * window token packing, PII-style redaction, Gopher-style repetition
  * signals, and deterministic stratified sampling. Scale notes per op in
  * the scaladocs; all are one- or two-shuffle plans keyed on high-
  * cardinality columns (doc_id / source / stratum), no driver loops.
  */
object PipelineOps {

  /** Context-window packing: assign documents to fixed token-budget bins
    * (training batch construction). Packing is OFFSET-BASED — bin =
    * floor(preceding-token-count / budget) within each source, the
    * standard scalable formulation (documents may straddle a boundary;
    * sequence builders split them downstream). Partitioning by `source`
    * is the scale story: each source packs independently under one
    * window sort, so the plan is an exchange on source + per-partition
    * sort — no global single-partition window (the thing that dies at
    * 100 TB). */
  val q132_token_packing: Q = (s, d) => {
    val budget = 256
    val win = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), " +")).as("ntok"))
      .withColumn("cum", sum(col("ntok")).over(win))
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
    * ratio, top-token share, duplicate-bigram ratio. Two explode+agg
    * passes keyed by doc_id (high cardinality, partial aggregation
    * map-side) joined on doc_id — repetition is the strongest cheap
    * quality signal for web-scale corpora after raw length. */
  val q134_repetition: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val toks = docs.select(col("doc_id"),
      explode(split(trim(col("text")), " +")).as("tok"))
    val uni = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("double").as("ntok"),
        count(lit(1)).cast("double").as("ndistinct"),
        max(col("c")).cast("double").as("topcnt"))
    val bi = docs
      .withColumn("ts", split(trim(col("text")), " +"))
      .filter(size(col("ts")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ts) - 2), i -> concat_ws(' ', ts[i], ts[i+1]))"))
        .as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("double").as("nbg"),
        count(lit(1)).cast("double").as("nbgd"))
    uni.join(bi, Seq("doc_id"))
      .select(col("doc_id"),
        round(lit(1.0) - col("ndistinct") / col("ntok"), 6).as("dup_unigram_ratio"),
        round(col("topcnt") / col("ntok"), 6).as("top_token_share"),
        round(lit(1.0) - col("nbgd") / col("nbg"), 6).as("dup_bigram_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic stratified sampling: an exact per-stratum quota taken
    * in multiplicative-hash order (Knuth constant), so the sample is
    * reproducible across runs, engines, and cluster layouts — no RNG.
    * One exchange on the stratum key; the per-stratum window sort is the
    * rank. At extreme stratum sizes swap in a two-pass variant (rate
    * pre-filter ~2x quota via the same hash, then exact trim) so the
    * sort touches a sliver — same hash, same sample. */
  val q135_stratified_sample: Q = (s, d) => {
    val quota = 50
    val hkey = pmod(col("doc_id") * lit(2654435761L), lit(1000000007L))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), hkey.as("hkey"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("hkey"), col("doc_id"))))
      .filter(col("rn") <= quota)
      .select(col("lang"), col("rn"), col("doc_id"))
      .orderBy(col("lang"), col("rn"))
  }

  val queries: Map[String, Q] = Map(
    "q132_token_packing" -> q132_token_packing,
    "q133_pii_redaction" -> q133_pii_redaction,
    "q134_repetition" -> q134_repetition,
    "q135_stratified_sample" -> q135_stratified_sample,
  )

  val oracles: Map[String, String] = Map(
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
  )
}
