package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Text analysis for large-scale training-data pipelines: token counting,
  * quality scoring, and language ID over the `documents` table. All are
  * narrow projections + scalar expressions — fully codegen'd, no shuffle
  * except final ordering, so they stream at scan speed on 100 TB.
  *
  * The reference's text machinery is its string UDF surface + `sentences`/
  * `ngrams` (ql/src/java/org/apache/hadoop/hive/ql/udf/generic/
  * GenericUDAFnGrams.java, GenericUDFSentences.java); these queries extend
  * it with the document-pipeline metrics a Hive user would build from
  * those primitives.
  */
object TextAnalysis {

  /** BPE-ish tokenizer regex: letter runs, digit runs, single punctuation.
    * No backslash classes: Spark SQL string literals eat `\s` while DuckDB
    * keeps it — an explicit space class parses identically in both. */
  val TokenRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "los", "de", "y", "es", "un"),
    "fr" -> Seq("le", "la", "et", "est", "un", "une"),
    "zh" -> Seq("de", "shi", "le", "zai"))

  /** Count tokens of `arr` that appear in `words`. */
  private def hitCount(arr: Column, words: Seq[String]): Column =
    size(filter(arr, t => array_contains(
      array(words.map(lit): _*), t)))

  /** Whitespace and regex token counts (token-counting stage of a data
    * pipeline; regexp_extract_all is codegen'd). */
  val q60_token_count: Q = (s, d) => {
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(split(trim(col("text")), " +")).as("ws_tokens"),
        size(expr(s"regexp_extract_all(text, '$TokenRe', 0)")).as("re_tokens"),
        length(col("text")).as("n_chars_live"),
        col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Composite quality score (the q61/q121 formula) as a reusable column
    * over a `text` column — also the keep-best criterion in
    * [[Dedup.q124_dedup_keep_best]]. */
  def qualityExpr: Column = {
    val toks = split(trim(col("text")), " +")
    val nchars = length(col("text")).cast("double")
    val npunct = length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("double")
    val nstop = hitCount(toks, stopwords("en")).cast("double")
    val ntok = size(toks).cast("double")
    least(ntok / lit(50.0), lit(1.0)) * 0.4 +
      (lit(1.0) - npunct / nchars) * 0.3 +
      least(nstop / ntok * 5, lit(1.0)) * 0.3
  }

  /** True iff any language's stopword list hits the text — equivalent to
    * "q62's predicted language is not 'und'" (the argmax language always
    * satisfies the >=-others chain, so the CASE yields non-und exactly
    * when some count is positive). Reused by the q209 curation funnel. */
  def anyLangHit: Column = {
    val toks = split(lower(col("text")), " +")
    greatest(stopwords.keys.toSeq.sorted.map(l => hitCount(toks, stopwords(l))): _*) > 0
  }

  /** [[anyLangHit]] in DuckDB SQL. */
  def anyLangHitSql: String =
    "greatest(" + stopwords.keys.toSeq.sorted.map(l =>
      duckHits("regexp_split_to_array(lower(text), ' +')", stopwords(l))).mkString(", ") + ") > 0"

  /** The q61 quality formula in DuckDB SQL (for oracles that reuse it). */
  def qualitySql: String =
    s"""least(CAST(len(regexp_split_to_array(trim(text), ' +')) AS DOUBLE) / 50.0, 1.0) * 0.4
       | + (1.0 - CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
       |          / CAST(length(text) AS DOUBLE)) * 0.3
       | + least(CAST(${duckHits("regexp_split_to_array(trim(text), ' +')", stopwords("en"))} AS DOUBLE)
       |         / CAST(len(regexp_split_to_array(trim(text), ' +')) AS DOUBLE) * 5, 1.0) * 0.3""".stripMargin

  /** Quality scoring: length, punctuation/digit/whitespace ratios,
    * mean token length, stopword density, and a composite score. */
  val q61_quality_score: Q = (s, d) => {
    val toks = split(trim(col("text")), " +")
    val nchars = length(col("text")).cast("double")
    val npunct = length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("double")
    val ndigit = length(regexp_replace(col("text"), "[^0-9]", "")).cast("double")
    val nstop = hitCount(toks, stopwords("en")).cast("double")
    val ntok = size(toks).cast("double")
    Tables.spread(Tables.documents(s, d), col("doc_id"))
      .select(
        col("doc_id"), col("lang"),
        nchars.as("n_chars_t"),
        ntok.as("n_tokens"),
        round(nchars / ntok, 6).as("mean_tok_len"),
        round(npunct / nchars, 6).as("punct_ratio"),
        round(ndigit / nchars, 6).as("digit_ratio"),
        round(nstop / ntok, 6).as("stopword_ratio"),
        round(qualityExpr, 6).as("quality")) // THE shared formula — q61/q121/q232 must agree
      .orderBy(col("doc_id"))
  }

  /** Language ID by stopword-hit voting with a fixed priority order for
    * ties (deterministic n-gram-style heuristic; real pipelines swap in a
    * model — the Spark plumbing is identical). */
  val q62_langid: Q = (s, d) => {
    val toks = split(lower(col("text")), " +")
    val langs = Seq("en", "de", "es", "fr", "zh")
    val scored = Tables.documents(s, d)
      .select(Seq(col("doc_id"), col("lang")) ++
        langs.map(l => hitCount(toks, stopwords(l)).as(s"c_$l")): _*)
    val pred = langs.foldRight(lit("und")) { (l, els) =>
      val c = col(s"c_$l")
      val isMax = langs.filter(_ != l)
        .map(o => c >= col(s"c_$o")).reduce(_ && _)
      when(c > 0 && isMax, lit(l)).otherwise(els)
    }
    scored
      .withColumn("predicted", pred)
      .withColumn("match", col("predicted") === col("lang"))
      .select(col("doc_id"), col("lang"), col("c_en"), col("c_de"),
              col("c_es"), col("c_fr"), col("c_zh"),
              col("predicted"), col("match"))
      .orderBy(col("doc_id"))
  }

  /** n-gram (bigram) frequency — the reference's `ngrams` UDAF
    * (GenericUDAFnGrams.java) as explode + count. */
  val q63_ngrams: Q = (s, d) => {
    Tables.documents(s, d)
      .withColumn("ts", split(trim(col("text")), " +"))
      // size(ts) < 2 must yield NO bigrams: a bare sequence(0, size-2)
      // would be sequence(0, -1) = [0, -1] (descending default step) and
      // a 1-token doc would emit two bogus unigram "bigrams" the DuckDB
      // oracle (range-based, empty below 2 tokens) never sees
      .filter(size(col("ts")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ts) - 2), i -> concat_ws(' ', ts[i], ts[i+1]))"))
        .as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 20)
      .orderBy(col("n").desc, col("bigram"))
  }

  /** BM25 relevance scoring against a fixed query-term set — the
    * retrieval primitive behind corpus search, decontamination triage,
    * and RAG indexing (Robertson–Spärck Jones defaults k1=1.2, b=0.75).
    * With a constant query, per-term tf extraction is a codegen'd scalar
    * filter over the token array — no explode, no per-token shuffle — so
    * the data-scaled cost is one scan plus a 1-row corpus-stats
    * broadcast (the same singleton scalar-gate shape as the DS queries;
    * at 100 TB the stats pass and the scoring pass each stream at scan
    * speed). Extends the reference's string/ngram surface
    * (GenericUDAFnGrams.java) with the ranking function built on it. */
  val q178_bm25: Q = (s, d) => {
    val terms = Seq("spark", "join", "filter")
    val k1 = 1.2
    val b = 0.75
    val toks = split(trim(col("text")), " +")
    // spread-safe: avgdl sums integer-valued doubles (token counts), so
    // partition order cannot move its bits
    val proj = Tables.spread(Tables.documents(s, d), col("doc_id")).select(
      Seq(col("doc_id"), size(toks).cast("double").as("dl")) ++
        terms.map(t =>
          size(filter(toks, x => x === lit(t))).cast("double").as(s"tf_$t")): _*)
    val statCols =
      Seq(count(lit(1)).cast("double").as("n"), avg(col("dl")).as("avgdl")) ++
        terms.map(t =>
          sum(when(col(s"tf_$t") > 0, 1).otherwise(0)).cast("double").as(s"df_$t"))
    val stats = proj.agg(statCols.head, statCols.tail: _*)
    val score = terms.map { t =>
      val tf = col(s"tf_$t")
      val df = col(s"df_$t")
      val idf = log(lit(1.0) + (col("n") - df + 0.5) / (df + 0.5))
      idf * tf * lit(k1 + 1) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    proj.crossJoin(broadcast(stats))
      .filter(terms.map(t => col(s"tf_$t")).reduce(_ + _) > 0)
      .select(col("doc_id"), round(score, 6).as("bm25"))
      .orderBy(col("doc_id"))
  }

  /** TF-IDF distinguishing terms per language: token explode (inherent
    * token-volume cost, map-side combined), document frequency over docs,
    * then a top-5-per-language window over the tiny (lang, term) agg
    * sliver — the window never sees raw data, so the only data-scaled
    * stages are the two keyed aggregations. The per-language vocabulary
    * report every multilingual corpus audit starts from. */
  val q182_tfidf_terms: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val tok = docs.select(col("doc_id"), col("lang"),
      explode(split(lower(trim(col("text"))), " +")).as("term"))
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val df = tok.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val tf = tok.groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("score").desc, col("term"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score", round(col("tf") * log(col("n_docs") / col("df")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("lang"), col("rnk"), col("term"), col("tf"), col("score"))
      .orderBy(col("lang"), col("rnk"))
  }

  /** Character-distribution entropy — the gibberish/noise signal quality
    * pipelines compute per document. No explode: per-character counts
    * over the fixed [a-z ] alphabet come from the length-after-replace
    * identity, 27 codegen'd scalar expressions evaluated in one scan —
    * entropy is then a fixed-order fold over those counts. Pure
    * projection; streams at scan speed on 100 TB. */
  val q183_char_entropy: Q = (s, d) => {
    val alphabet = ('a' to 'z').map(_.toString) :+ " "
    val cnt = alphabet.map(ch =>
      (length(col("text")) - length(replace(col("text"), lit(ch), lit("")))).cast("double"))
    val total = cnt.reduce(_ + _)
    val entropy = cnt.map(c =>
      when(c > 0, -(c / total) * log(c / total)).otherwise(lit(0.0))).reduce(_ + _)
    Tables.documents(s, d)
      .select(col("doc_id"), total.cast("long").as("n_alpha"),
              round(entropy, 6).as("entropy"))
      .orderBy(col("doc_id"))
  }

  /** Winsorized token-count statistics per language — the outlier-robust
    * length report corpus audits use instead of raw means. Clip bounds
    * are integerized percentiles (floor(p05), ceil(p95)), so every
    * clipped value is an exact integer-in-double and the final mean is
    * bit-identical regardless of partition summation order — the same
    * trick as the decimal-sum convention for money. Two data passes:
    * an exact-percentile agg producing a per-language sliver, broadcast
    * back for the clipped aggregate; raw data never sorts globally. */
  val q184_winsorized: Q = (s, d) => {
    val ntok = size(split(trim(col("text")), " +")).cast("double")
    val proj = Tables.documents(s, d).select(col("lang"), ntok.as("n_tokens"))
    val bounds = proj.groupBy(col("lang")).agg(
      floor(expr("percentile(n_tokens, 0.05)")).as("lo"),
      ceil(expr("percentile(n_tokens, 0.95)")).as("hi"))
    proj.join(broadcast(bounds), Seq("lang"))
      .select(col("lang"), col("lo"), col("hi"),
        least(greatest(col("n_tokens"), col("lo")), col("hi")).as("w"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           min(col("lo")).as("p05_floor"), max(col("hi")).as("p95_ceil"),
           round(avg(col("w")), 6).as("wins_mean"))
      .orderBy(col("lang"))
  }

  /** Power-of-two document-length histogram per source — the corpus
    * shape report (bucket = bit length of the char count, an
    * integer-exact floor(log2)+1 that cannot flip at bucket boundaries
    * the way float log2 can). Pure map-side-combinable aggregate. */
  val q185_length_histogram: Q = (s, d) => {
    Tables.documents(s, d)
      .select(col("source"), length(col("text")).cast("bigint").as("len"))
      .withColumn("bucket", length(bin(col("len"))))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
           min(col("len")).as("min_len"), max(col("len")).as("max_len"))
      .orderBy(col("source"), col("bucket"))
  }

  /** Trigram novelty score — the share of a document's distinct trigrams
    * that occur in no other document. Low novelty = boilerplate /
    * near-duplicate content the dedup family should have caught; the
    * standard cross-check signal next to MinHash. (Trigrams, not
    * bigrams: this corpus's vocabulary is small enough that nearly every
    * bigram repeats, which would make the score degenerate.) Costs one
    * trigram explode (inherent token volume, map-side combined), a
    * document-frequency aggregate keyed on the trigram (high cardinality
    * — no skew), and a join back from the df sliver; no pairwise work,
    * so it scales like q63/q134, not like all-pairs dedup. */
  val q186_novelty: Q = (s, d) => {
    val grams = Tables.documents(s, d)
      .withColumn("ts", split(trim(col("text")), " +"))
      .filter(size(col("ts")) >= 3)
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(0, size(ts) - 3), " +
          "i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2])))")).as("trigram"))
    val df = grams.groupBy(col("trigram"))
      .agg(count(lit(1)).as("df"))
    grams.join(df, Seq("trigram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"),
           sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty",
        round(col("n_unique").cast("double") / col("n_trigrams"), 6))
      .select(col("doc_id"), col("n_trigrams"), col("n_unique"), col("novelty"))
      .orderBy(col("doc_id"))
  }

  /** The end-to-end curation pass a training-data pipeline runs nightly:
    * keep each document iff it is (a) the canonical copy of its exact
    * text (min doc_id), (b) above the quality bar, (c) predicted English,
    * and (d) inside the token budget — one scan, one window over the text
    * key, everything else codegen'd scalars. */
  val q121_curation: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val toks = split(trim(col("text")), " +")
    val toksLower = split(lower(col("text")), " +")
    val nchars = length(col("text")).cast("double")
    val npunct = length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("double")
    val nstop = hitCount(toks, stopwords("en")).cast("double")
    val ntok = size(toks).cast("double")
    val quality = qualityExpr // THE shared formula — one definition, never re-spelled
    val langs = Seq("en", "de", "es", "fr", "zh")
    val cEn = hitCount(toksLower, stopwords("en"))
    val enPredicted = cEn > 0 && langs.filter(_ != "en")
      .map(l => cEn >= hitCount(toksLower, stopwords(l))).reduce(_ && _)
    val w = Window.partitionBy(col("text")).orderBy(col("doc_id"))
    Tables.documents(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && quality >= 0.5 && enPredicted &&
              size(toks).between(5, 10000))
      .select(col("doc_id"), size(toks).as("n_tokens"),
              round(quality, 6).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** PII redaction — the scrub pass every training-data pipeline runs
    * before tokenization. Patterns are plain character classes (no
    * backslash escapes — they survive both engines' string literals
    * identically); replacement is anchored markers so downstream dedup
    * keys stay stable. The PII-bearing text is derived deterministically
    * from customer fields (the fixture corpus is synthetic word soup with
    * no digits), so the regexes exercise real matches, not a vacuous
    * zero-hit scan. Pure projection: codegen'd, scan-speed at 100 TB. */
  val q176_pii_scrub: Q = (s, d) => {
    val raw = concat(
      col("c_name"), lit(" <"),
      lower(translate(col("c_name"), "#", "")), lit("@example.com> phone 555-"),
      lpad((col("c_custkey") % 10000).cast("string"), 4, "0"))
    val scrubbed = regexp_replace(
      regexp_replace(raw, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "[EMAIL]"),
      "[0-9]{3}-[0-9]{4}", "[PHONE]")
    Tables.customer(s, d)
      .filter(col("c_custkey") <= 500)
      .select(col("c_custkey"), scrubbed.as("scrubbed"),
              raw.rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+").as("had_email"))
      .orderBy(col("c_custkey"))
  }

  /** Rare-token ratio — the unigram-frequency quality signal corpus
    * filters use (docs dominated by tokens the corpus has barely seen are
    * OCR noise, codes, or foreign-script leakage). One token explode+agg
    * builds the vocab counts (map-side combined); the corpus token total
    * joins the vocab SLIVER (not the corpus) as a broadcast 1-row scalar;
    * the vocab-with-flags then broadcasts back onto the token stream. A
    * token is "rare" when its count is under 1/500th of the corpus total
    * — relative, so the signal survives any scale factor. All aggregates
    * are integer-exact; the single ratio division is one IEEE op, safe
    * for the bit-exact oracle. */
  val q198_token_rarity: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val tokens = docs
      .select(col("doc_id"), explode(split(trim(col("text")), " +")).as("tok"))
    val counts = tokens.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    // corpus token total from the doc-level sizes — same number as
    // sum(cnt) but computed WITHOUT re-exploding the token stream, so the
    // vocab-count subtree runs once (PlanSpec pins the shuffle budget)
    val total = docs
      .agg(sum(size(split(trim(col("text")), " +"))).as("total"))
    val flagged = counts.crossJoin(broadcast(total))
      .select(col("tok"), col("cnt"), (col("cnt") * 500 < col("total")).as("is_rare"))
    tokens.join(broadcast(flagged), Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
           sum(when(col("is_rare"), 1L).otherwise(0L)).as("n_rare"),
           min(col("cnt")).as("rarest_cnt"))
      .withColumn("rare_ratio", col("n_rare").cast("double") / col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** BPE-style merge-candidate counting — the inner loop of tokenizer
    * training: count adjacent token pairs across the corpus, rank the
    * top merge candidates. One zip_with per document builds the pair
    * array with NO join and no window; the explode+agg is map-side
    * combined and keyed by pair, so the shuffle carries only (pair,
    * partial count) — at 100 TB this is a scan plus one vocab-sized
    * shuffle, exactly how distributed BPE rounds run. Deterministic
    * top-20 via (count desc, pair asc). */
  val q199_bpe_pairs: Q = (s, d) => {
    val ws = split(trim(col("text")), " +")
    val pairs = zip_with(
      slice(ws, lit(1), size(ws) - 1),
      slice(ws, lit(2), size(ws) - 1),
      (a, b) => concat(a, lit(" "), b))
    Tables.documents(s, d)
      .select(explode(pairs).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(20)
  }

  /** Bigram-LM perplexity proxy (the CCNet/Gopher-style LM quality
    * filter, self-trained on the corpus): per-doc mean negative
    * log-likelihood under the MLE bigram model p(w2|w1) =
    * c(w1 w2) / c_prefix(w1). Fluent/common text scores low; gibberish
    * and boilerplate-with-rare-joins score high.
    *
    * Exactness: each ln term is quantized to integer MILLI-NATS before
    * the per-doc sum — integer sums are order-free, so Spark's
    * partition-order float summation cannot flip bits vs DuckDB (the
    * q184 winsorize trick applied to logs). Scale: two vocab-keyed
    * count aggs (map-side combined), then the scoring joins shuffle on
    * pair/prefix keys; the prefix key is Zipf-skewed, which is exactly
    * what AQE skew-join handles (ScaleSpec pins that machinery). */
  val q207_bigram_lm: Q = (s, d) => {
    val ws = split(trim(col("text")), " +")
    val pairs = zip_with(
      slice(ws, lit(1), size(ws) - 1),
      slice(ws, lit(2), size(ws) - 1),
      (a, b) => struct(a.as("w1"), concat(a, lit(" "), b).as("pair")))
    val bg = Tables.documents(s, d)
      .filter(size(ws) >= 2)
      .select(col("doc_id"), explode(pairs).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.pair").as("pair"))
    val cb = bg.groupBy(col("pair")).agg(count(lit(1)).as("cb"))
    val cu = bg.groupBy(col("w1")).agg(count(lit(1)).as("cu"))
    bg.join(cb, Seq("pair")).join(cu, Seq("w1"))
      .select(col("doc_id"),
              round(log(col("cb") / col("cu")) * 1000, 0).cast("long").as("milli"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("milli")).as("sum_milli"))
      .select(col("doc_id"), col("n_bigrams"),
              round((-col("sum_milli")).cast("double") /
                    (col("n_bigrams") * 1000).cast("double"), 6).as("avg_neg_logp"))
      .orderBy(col("doc_id"))
  }

  /** Source-level quality gate (the URL-domain filtering step of
    * RefinedWeb/CCNet-style pipelines): score each SOURCE by a
    * corpus-level aggregate, then keep only documents from passing
    * sources. Scale shape: the per-source verdict is a 20-row sliver
    * broadcast back onto the corpus — the corpus itself is never
    * reshuffled for the gate. The avg-length threshold is compared
    * multiply-through (sum_chars >= 290 * n_docs) so every engine sees
    * exact integer arithmetic, never a float average. */
  val q214_source_gate: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val verdict = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .filter(col("sum_chars") >= lit(290L) * col("n_docs"))
      .select(col("source"))
    docs.join(broadcast(verdict), Seq("source"), "left_semi")
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      .orderBy(col("source"), col("lang"))
  }

  /** Per-source median quality gate — keep each source's top half by the
    * q61 quality score. The 100 TB shape: ONE per-source exact-percentile
    * agg (|sources| rows, broadcast back) plus a codegen'd filter — no
    * corpus-wide window sort; at petabyte scale swap `percentile` for
    * `percentile_approx` and nothing else changes. Threshold comparisons
    * are float-safe across engines: the median either equals a present
    * rounded quality value (odd count or ties) or lies strictly between
    * two adjacent ones, so even if the interpolated bits differ the keep
    * decisions are identical. */
  val q232_quality_gate: Q = (s, d) => {
    val scored = Tables.spread(Tables.documents(s, d), col("doc_id"))
      .select(col("doc_id"), col("source"), round(qualityExpr, 6).as("quality"))
    val thr = scored.groupBy(col("source"))
      .agg(expr("percentile(quality, 0.5)").as("thr"))
    scored.join(broadcast(thr), Seq("source"))
      .filter(col("quality") >= col("thr"))
      .select(col("doc_id"), col("source"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** Per-source token-distribution drift — the distribution-shift
    * monitor a pipeline runs when a source changes crawl or parser
    * version: over the corpus's top-100 tokens, compare each source's
    * integer micro-rate (tokens-per-million, floor division) against
    * the corpus rate and sum squared deviations. All-integer until the
    * final sum, so the score is bit-stable across engines and
    * summation orders. Shape: one (source, token) agg; corpus totals
    * re-aggregated from that sliver (no second scan); the top-K lattice
    * is |sources| x 100 rows built from two broadcast singletons. */
  val q239_source_token_drift: Q = (s, d) => {
    val st = Tables.documents(s, d)
      .select(col("source"), explode(split(trim(col("text")), " +")).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    val corpus = st.groupBy(col("tok")).agg(sum(col("c")).as("cc"))
    val topK = corpus.orderBy(col("cc").desc, col("tok")).limit(100)
    val srcTotals = st.groupBy(col("source")).agg(sum(col("c")).as("n_s"))
    val total = corpus.agg(sum(col("cc")).as("nn"))
    srcTotals.crossJoin(broadcast(topK))
      .join(st, Seq("source", "tok"), "left")
      .crossJoin(broadcast(total))
      .select(col("source"), col("n_s"),
        expr("(coalesce(c, 0L) * 1000000L) div n_s").as("rs"),
        expr("(cc * 1000000L) div nn").as("rc"))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_tokens"),
           sum((col("rs") - col("rc")) * (col("rs") - col("rc"))).as("drift"))
      .orderBy(col("source"))
  }

  /** Top token co-occurrence pairs — the corpus-statistics report
    * behind phrase mining and tokenizer-merge candidates: among the
    * top-50 tokens by document frequency, count the documents where
    * each unordered pair co-occurs. The vocabulary cap is what makes
    * this scale: per-doc pair fan-out is bounded by C(50,2), the pair
    * aggregation is map-side combinable into <= 1225 keys, and the
    * vocab itself broadcasts. All-integer output, deterministic
    * tie-break. */
  val q242_token_cooccurrence: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(array_distinct(split(trim(col("text")), " +"))).as("tok"))
    val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok")).limit(50).select(col("tok"))
    val t = toks.join(broadcast(top), Seq("tok"))
    t.select(col("doc_id"), col("tok").as("ta"))
      .join(t.select(col("doc_id"), col("tok").as("tb")), Seq("doc_id"))
      .filter(col("ta") < col("tb"))
      .groupBy(col("ta"), col("tb"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("ta"), col("tb"))
      .limit(20)
  }

  /** The Gopher document-filter rule battery (Rae et al. 2021,
    * "Scaling Language Models: ... Gopher", appendix A1.1), verbatim:
    * word count in [50, 100k]; mean word length in [3, 10]; symbol-to-
    * word ratio (# and ...) < 0.1; < 90% of lines bullet-led; < 30% of
    * lines ellipsis-ended; >= 80% of words contain an alphabetic char;
    * at least 2 distinct hits from the 8-word stop list. Every ratio is
    * evaluated as an INTEGER cross-multiplication (10*symbols < words,
    * not symbols/words < 0.1) so the row is bit-stable and DuckDB-
    * replayable with no float anywhere. All seven rules plus the
    * composite run in ONE projection over the scan — at 100 TB this is
    * the scan-speed gate it is in production pipelines; the only
    * exchange is the output ordering. */
  val q271_gopher_rules: Q = (s, d) => {
    val words = filter(split(trim(col("text")), "\\s+"), w => w =!= "")
    val lines = split(col("text"), "\n")
    val wordsL = transform(words, w => lower(w))
    val nWords = size(words).cast("long")
    val nWordChars = aggregate(words, lit(0L), (acc, w) => acc + length(w))
    val nAlphaWords = size(filter(words, w => w.rlike("[A-Za-z]"))).cast("long")
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines, x =>
      ltrim(x).startsWith("- ") || ltrim(x).startsWith("* "))).cast("long")
    val nEllLines = size(filter(lines, x => rtrim(x).endsWith("..."))).cast("long")
    val nSymbols = (length(col("text")) - length(translate(col("text"), "#", ""))).cast("long") +
      regexp_count(col("text"), lit("\\.\\.\\."))
    val stopKinds = Seq("the", "be", "to", "of", "and", "that", "have", "with")
      .map(w => array_contains(wordsL, w).cast("long")).reduce(_ + _)
    val rWordCount = nWords.between(50, 100000)
    val rMeanLen = (lit(3) * nWords <= nWordChars) && (nWordChars <= lit(10) * nWords)
    val rSymbol = lit(10) * nSymbols < nWords
    val rBullet = lit(10) * nBullet < lit(9) * nLines
    val rEllipsis = lit(10) * nEllLines < lit(3) * nLines
    val rAlpha = lit(10) * nAlphaWords >= lit(8) * nWords
    val rStop = stopKinds >= 2
    Tables.spread(Tables.documents(s, d), col("doc_id"))
      .select(col("doc_id"), nWords.as("n_words"),
        rWordCount.as("r_word_count"), rMeanLen.as("r_mean_word_len"),
        rSymbol.as("r_symbol_ratio"), rBullet.as("r_bullet_lines"),
        rEllipsis.as("r_ellipsis_lines"), rAlpha.as("r_alpha_words"),
        rStop.as("r_stopwords"),
        (rWordCount && rMeanLen && rSymbol && rBullet && rEllipsis && rAlpha && rStop)
          .as("gopher_pass"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "q271_gopher_rules" -> q271_gopher_rules,
    "q242_token_cooccurrence" -> q242_token_cooccurrence,
    "q239_source_token_drift" -> q239_source_token_drift,
    "q232_quality_gate" -> q232_quality_gate,
    "q214_source_gate" -> q214_source_gate,
    "q207_bigram_lm" -> q207_bigram_lm,
    "q199_bpe_pairs" -> q199_bpe_pairs,
    "q198_token_rarity" -> q198_token_rarity,
    "q176_pii_scrub" -> q176_pii_scrub,
    "q178_bm25" -> q178_bm25,
    "q182_tfidf_terms" -> q182_tfidf_terms,
    "q183_char_entropy" -> q183_char_entropy,
    "q184_winsorized" -> q184_winsorized,
    "q185_length_histogram" -> q185_length_histogram,
    "q186_novelty" -> q186_novelty,
    "q121_curation" -> q121_curation,
    "q60_token_count" -> q60_token_count,
    "q61_quality_score" -> q61_quality_score,
    "q62_langid" -> q62_langid,
    "q63_ngrams" -> q63_ngrams,
  )

  private def duckHits(arrSql: String, words: Seq[String]): String =
    s"len(list_filter($arrSql, t -> list_contains([${words.map(w => s"'$w'").mkString(",")}], t)))"

  val oracles: Map[String, String] = Map(
    "q271_gopher_rules" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'), w -> w <> '') AS words,
        |    string_split(text, chr(10)) AS lines,
        |    length(text) - length(replace(text, '#', '')) AS n_hash,
        |    len(regexp_extract_all(text, '\.\.\.')) AS n_ell
        |  FROM documents
        |), m AS (
        |  SELECT doc_id,
        |    len(words) AS n_words,
        |    CAST(coalesce(list_sum(list_transform(words, w -> length(w))), 0) AS BIGINT) AS n_word_chars,
        |    len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha_words,
        |    len(lines) AS n_lines,
        |    len(list_filter(lines, x -> ltrim(x) LIKE '- %' OR ltrim(x) LIKE '* %')) AS n_bullet,
        |    len(list_filter(lines, x -> rtrim(x) LIKE '%...')) AS n_ell_lines,
        |    n_hash + n_ell AS n_symbols,
        |    CAST(list_contains(list_transform(words, w -> lower(w)), 'the') AS BIGINT)
        |      + CAST(list_contains(list_transform(words, w -> lower(w)), 'be') AS BIGINT)
        |      + CAST(list_contains(list_transform(words, w -> lower(w)), 'to') AS BIGINT)
        |      + CAST(list_contains(list_transform(words, w -> lower(w)), 'of') AS BIGINT)
        |      + CAST(list_contains(list_transform(words, w -> lower(w)), 'and') AS BIGINT)
        |      + CAST(list_contains(list_transform(words, w -> lower(w)), 'that') AS BIGINT)
        |      + CAST(list_contains(list_transform(words, w -> lower(w)), 'have') AS BIGINT)
        |      + CAST(list_contains(list_transform(words, w -> lower(w)), 'with') AS BIGINT)
        |      AS n_stop_kinds
        |  FROM base
        |)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |  (n_words BETWEEN 50 AND 100000) AS r_word_count,
        |  (3 * n_words <= n_word_chars AND n_word_chars <= 10 * n_words) AS r_mean_word_len,
        |  (10 * n_symbols < n_words) AS r_symbol_ratio,
        |  (10 * n_bullet < 9 * n_lines) AS r_bullet_lines,
        |  (10 * n_ell_lines < 3 * n_lines) AS r_ellipsis_lines,
        |  (10 * n_alpha_words >= 8 * n_words) AS r_alpha_words,
        |  (n_stop_kinds >= 2) AS r_stopwords,
        |  ((n_words BETWEEN 50 AND 100000)
        |   AND (3 * n_words <= n_word_chars AND n_word_chars <= 10 * n_words)
        |   AND (10 * n_symbols < n_words) AND (10 * n_bullet < 9 * n_lines)
        |   AND (10 * n_ell_lines < 3 * n_lines) AND (10 * n_alpha_words >= 8 * n_words)
        |   AND (n_stop_kinds >= 2)) AS gopher_pass
        |FROM m ORDER BY doc_id""".stripMargin,
    "q242_token_cooccurrence" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, unnest(regexp_split_to_array(trim(text), ' +')) AS tok
        |  FROM documents),
        |top AS (SELECT tok FROM (
        |  SELECT tok, count(1) AS df FROM toks GROUP BY 1
        |  ORDER BY df DESC, tok LIMIT 50)),
        |t AS (SELECT doc_id, tok FROM toks WHERE tok IN (SELECT tok FROM top))
        |SELECT a.tok AS ta, b.tok AS tb, count(1) AS n_docs
        |FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.tok < b.tok
        |GROUP BY 1, 2 ORDER BY n_docs DESC, ta, tb LIMIT 20""".stripMargin,
    "q239_source_token_drift" ->
      """WITH t AS (
        |  SELECT source, unnest(regexp_split_to_array(trim(text), ' +')) AS tok
        |  FROM documents),
        |st AS (SELECT source, tok, count(1) AS c FROM t GROUP BY 1, 2),
        |corpus AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS cc FROM st GROUP BY 1),
        |topk AS (SELECT tok, cc FROM corpus ORDER BY cc DESC, tok LIMIT 100),
        |tot AS (SELECT CAST(SUM(cc) AS BIGINT) AS nn FROM corpus),
        |srct AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_s FROM st GROUP BY 1),
        |j AS (SELECT l.source, l.n_s,
        |        (COALESCE(st.c, 0) * 1000000) // l.n_s AS rs,
        |        (l.cc * 1000000) // (SELECT nn FROM tot) AS rc
        |      FROM (SELECT s.source, s.n_s, k.tok, k.cc
        |            FROM srct s CROSS JOIN topk k) l
        |      LEFT JOIN st ON st.source = l.source AND st.tok = l.tok)
        |SELECT source, max(n_s) AS n_tokens,
        |  CAST(SUM((rs - rc) * (rs - rc)) AS BIGINT) AS drift
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q232_quality_gate" ->
      s"""WITH scored AS (
         |  SELECT doc_id, source, round($qualitySql, 6) AS quality FROM documents),
         |thr AS (SELECT source, quantile_cont(quality, 0.5) AS thr
         |        FROM scored GROUP BY source)
         |SELECT s.doc_id, s.source, s.quality
         |FROM scored s JOIN thr t ON s.source = t.source
         |WHERE s.quality >= t.thr
         |ORDER BY s.doc_id""".stripMargin,
    "q214_source_gate" ->
      """WITH v AS (
        |  SELECT source FROM documents GROUP BY source
        |  HAVING sum(n_chars) >= 290 * count(1))
        |SELECT source, lang, count(1) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents WHERE source IN (SELECT source FROM v)
        |GROUP BY source, lang ORDER BY source, lang""".stripMargin,
    "q207_bigram_lm" ->
      """WITH w AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS ws FROM documents),
        |e AS (
        |  SELECT doc_id, ws[i] AS w1, ws[i] || ' ' || ws[i + 1] AS pair
        |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
        |        FROM w WHERE len(ws) >= 2)),
        |cb AS (SELECT pair, count(*) AS cb FROM e GROUP BY 1),
        |cu AS (SELECT w1, count(*) AS cu FROM e GROUP BY 1),
        |t AS (SELECT doc_id, CAST(round(ln(cb.cb / cu.cu) * 1000, 0) AS BIGINT) AS milli
        |      FROM e JOIN cb USING (pair) JOIN cu USING (w1))
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(CAST(-sum(milli) AS DOUBLE) / CAST(count(*) * 1000 AS DOUBLE), 6) AS avg_neg_logp
        |FROM t GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q199_bpe_pairs" ->
      """WITH w AS (
        |  SELECT regexp_split_to_array(trim(text), ' +') AS ws FROM documents),
        |e AS (
        |  SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
        |  FROM w WHERE len(ws) >= 2)
        |SELECT ws[i] || ' ' || ws[i + 1] AS pair, count(*) AS cnt
        |FROM e GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 20""".stripMargin,
    "q198_token_rarity" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), ' +')) AS tok
        |  FROM documents),
        |c AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
        |t AS (SELECT sum(len(regexp_split_to_array(trim(text), ' +'))) AS total
        |      FROM documents),
        |f AS (SELECT tok, cnt, cnt * 500 < (SELECT total FROM t) AS is_rare FROM c)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN is_rare THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
        |  min(cnt) AS rarest_cnt,
        |  CAST(sum(CASE WHEN is_rare THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS rare_ratio
        |FROM toks JOIN f USING (tok)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q186_novelty" ->
      """WITH w AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS ws FROM documents),
        |e AS (
        |  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i
        |  FROM w WHERE len(ws) >= 3),
        |g AS (SELECT DISTINCT doc_id,
        |        ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS trigram FROM e),
        |dfq AS (SELECT trigram, count(*) AS df FROM g GROUP BY trigram)
        |SELECT g.doc_id, count(*) AS n_trigrams,
        |  CAST(sum(CASE WHEN dfq.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
        |  round(CAST(sum(CASE WHEN dfq.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |        / count(*), 6) AS novelty
        |FROM g JOIN dfq USING (trigram)
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,
    "q184_winsorized" ->
      """WITH t AS (
        |  SELECT lang,
        |    CAST(len(regexp_split_to_array(trim(text), ' +')) AS DOUBLE) AS n_tokens
        |  FROM documents),
        |b AS (
        |  SELECT lang, CAST(floor(quantile_cont(n_tokens, 0.05)) AS BIGINT) AS lo,
        |         CAST(ceil(quantile_cont(n_tokens, 0.95)) AS BIGINT) AS hi
        |  FROM t GROUP BY lang)
        |SELECT t.lang, count(*) AS n_docs,
        |  min(b.lo) AS p05_floor, max(b.hi) AS p95_ceil,
        |  round(avg(least(greatest(t.n_tokens, b.lo), b.hi)), 6) AS wins_mean
        |FROM t JOIN b USING (lang)
        |GROUP BY t.lang ORDER BY t.lang""".stripMargin,
    "q185_length_histogram" ->
      """SELECT source, CAST(length(bin(CAST(length(text) AS BIGINT))) AS INT) AS bucket,
        |  count(*) AS n_docs, min(length(text)) AS min_len, max(length(text)) AS max_len
        |FROM documents
        |GROUP BY source, bucket
        |ORDER BY source, bucket""".stripMargin,
    "q182_tfidf_terms" ->
      """WITH tok AS (
        |  SELECT doc_id, lang,
        |    unnest(regexp_split_to_array(lower(trim(text)), ' +')) AS term
        |  FROM documents),
        |dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
        |tfq AS (SELECT lang, term, count(*) AS tf FROM tok GROUP BY lang, term),
        |j AS (
        |  SELECT tfq.lang, tfq.term, tfq.tf,
        |    round(tfq.tf * ln((SELECT count(*) FROM documents) * 1.0 / dfq.df), 6) AS score
        |  FROM tfq JOIN dfq USING (term)),
        |r AS (
        |  SELECT lang, term, tf, score,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score DESC, term) AS rnk
        |  FROM j)
        |SELECT lang, rnk, term, tf, score FROM r
        |WHERE rnk <= 5 ORDER BY lang, rnk""".stripMargin,
    "q183_char_entropy" -> {
      val alphabet = ('a' to 'z').map(_.toString) :+ " "
      val cnts = alphabet.map(ch =>
        s"CAST(length(text) - length(replace(text, '$ch', '')) AS DOUBLE)")
      val total = cnts.mkString("(", " + ", ")")
      val entropy = cnts.map(c =>
        s"CASE WHEN $c > 0 THEN -($c / t.tot) * ln($c / t.tot) ELSE 0.0 END")
        .mkString("\n    + ")
      s"""SELECT doc_id, CAST(t.tot AS BIGINT) AS n_alpha,
         |  round($entropy, 6) AS entropy
         |FROM (SELECT doc_id, text, $total AS tot FROM documents) t
         |ORDER BY doc_id""".stripMargin
    },
    "q178_bm25" -> {
      val terms = Seq("spark", "join", "filter")
      val toksSql = "regexp_split_to_array(trim(text), ' +')"
      val tfCols = terms.map(t =>
        s"CAST(len(list_filter($toksSql, x -> x = '$t')) AS DOUBLE) AS tf_$t").mkString(",\n    ")
      val dfCols = terms.map(t =>
        s"CAST(sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_$t").mkString(",\n    ")
      val score = terms.map(t =>
        s"ln(1.0 + (n - df_$t + 0.5) / (df_$t + 0.5)) * tf_$t * 2.2 " +
          s"/ (tf_$t + 1.2 * (0.25 + 0.75 * dl / avgdl))").mkString("\n    + ")
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(len($toksSql) AS DOUBLE) AS dl,
         |    $tfCols
         |  FROM documents),
         |st AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
         |    $dfCols
         |  FROM t)
         |SELECT doc_id, round($score, 6) AS bm25
         |FROM t, st
         |WHERE ${terms.map(t => s"tf_$t").mkString(" + ")} > 0
         |ORDER BY doc_id""".stripMargin
    },
    "q176_pii_scrub" ->
      """WITH raw AS (
        |  SELECT c_custkey,
        |    c_name || ' <' || lower(replace(c_name, '#', '')) ||
        |    '@example.com> phone 555-' ||
        |    lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') AS r
        |  FROM customer WHERE c_custkey <= 500)
        |SELECT c_custkey,
        |  regexp_replace(
        |    regexp_replace(r, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '[EMAIL]', 'g'),
        |    '[0-9]{3}-[0-9]{4}', '[PHONE]', 'g') AS scrubbed,
        |  regexp_matches(r, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+') AS had_email
        |FROM raw ORDER BY c_custkey""".stripMargin,
    "q121_curation" -> {
      val toksSql = "regexp_split_to_array(trim(text), ' +')"
      val toksLowerSql = "regexp_split_to_array(lower(text), ' +')"
      val langs = Seq("de", "es", "fr", "zh")
      val enMax = langs.map(l =>
        s"${duckHits(toksLowerSql, stopwords("en"))} >= ${duckHits(toksLowerSql, stopwords(l))}")
        .mkString(" AND ")
      s"""WITH t AS (SELECT doc_id, text,
         |    CAST(length(text) AS DOUBLE) AS nchars,
         |    CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) AS npunct,
         |    CAST(${duckHits(toksSql, stopwords("en"))} AS DOUBLE) AS nstop,
         |    CAST(len($toksSql) AS DOUBLE) AS ntok,
         |    ${duckHits(toksLowerSql, stopwords("en"))} AS c_en,
         |    ($enMax) AS en_is_max,
         |    ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
         |  FROM documents)
         |SELECT doc_id, CAST(ntok AS INT) AS n_tokens,
         |  round(least(ntok / 50.0, 1.0) * 0.4
         |        + (1.0 - npunct / nchars) * 0.3
         |        + least(nstop / ntok * 5, 1.0) * 0.3, 6) AS quality
         |FROM t
         |WHERE rn = 1
         |  AND least(ntok / 50.0, 1.0) * 0.4
         |      + (1.0 - npunct / nchars) * 0.3
         |      + least(nstop / ntok * 5, 1.0) * 0.3 >= 0.5
         |  AND c_en > 0 AND en_is_max
         |  AND ntok BETWEEN 5 AND 10000
         |ORDER BY doc_id""".stripMargin
    },
    "q60_token_count" ->
      s"""SELECT doc_id,
         |  len(regexp_split_to_array(trim(text), ' +')) AS ws_tokens,
         |  len(regexp_extract_all(text, '$TokenRe')) AS re_tokens,
         |  length(text) AS n_chars_live,
         |  n_chars
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q61_quality_score" ->
      s"""WITH t AS (SELECT doc_id, lang,
         |    CAST(length(text) AS DOUBLE) AS nchars,
         |    CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) AS npunct,
         |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS ndigit,
         |    CAST(${duckHits("regexp_split_to_array(trim(text), ' +')", stopwords("en"))} AS DOUBLE) AS nstop,
         |    CAST(len(regexp_split_to_array(trim(text), ' +')) AS DOUBLE) AS ntok
         |  FROM documents)
         |SELECT doc_id, lang,
         |  nchars AS n_chars_t,
         |  ntok AS n_tokens,
         |  round(nchars / ntok, 6) AS mean_tok_len,
         |  round(npunct / nchars, 6) AS punct_ratio,
         |  round(ndigit / nchars, 6) AS digit_ratio,
         |  round(nstop / ntok, 6) AS stopword_ratio,
         |  round(least(ntok / 50.0, 1.0) * 0.4
         |        + (1.0 - npunct / nchars) * 0.3
         |        + least(nstop / ntok * 5, 1.0) * 0.3, 6) AS quality
         |FROM t ORDER BY doc_id""".stripMargin,
    "q62_langid" -> {
      val toksSql = "regexp_split_to_array(lower(text), ' +')"
      val langs = Seq("en", "de", "es", "fr", "zh")
      val counts = langs.map(l => s"${duckHits(toksSql, stopwords(l))} AS c_$l").mkString(",\n    ")
      val whenChain = langs.map { l =>
        val cond = langs.filter(_ != l).map(o => s"c_$l >= c_$o").mkString(" AND ")
        s"WHEN c_$l > 0 AND $cond THEN '$l'"
      }.mkString("\n    ")
      s"""WITH t AS (SELECT doc_id, lang,
         |    $counts
         |  FROM documents)
         |SELECT doc_id, lang, c_en, c_de, c_es, c_fr, c_zh,
         |  CASE $whenChain ELSE 'und' END AS predicted,
         |  (CASE $whenChain ELSE 'und' END) = lang AS "match"
         |FROM t ORDER BY doc_id""".stripMargin
    },
    "q63_ngrams" ->
      """WITH w AS (SELECT regexp_split_to_array(trim(text), ' +') AS ts FROM documents),
        |  b AS (SELECT unnest([ts[i] || ' ' || ts[i+1] for i in range(1, len(ts))]) AS bigram FROM w)
        |SELECT bigram, COUNT(1) AS n FROM b
        |GROUP BY bigram HAVING COUNT(1) >= 20
        |ORDER BY n DESC, bigram""".stripMargin,
  )
}
