package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Hive's `ngrams` UDAF (ql/src/java/org/apache/hadoop/hive/ql/udf/
  * generic/GenericUDAFnGrams.java) as a typed Spark Aggregator: estimate
  * the top-k n-gram frequencies of a token-array column. The reference
  * prunes its frequency map heuristically; this implementation counts
  * exactly and prunes only above `maxEntries` (same partial/merge/final
  * contract as GenericUDAFEvaluator modes PARTIAL1/PARTIAL2/FINAL —
  * Aggregator.reduce/merge/finish map 1:1).
  *
  * Output is a deterministic "ngram:count|ngram:count|..." string, top-k
  * by (count desc, ngram asc) — stable across partitionings because
  * counting is exact and the tiebreak total.
  */
class NGramsAggregator(n: Int, k: Int, maxEntries: Int = 100000)
    extends Aggregator[Seq[String], Map[String, Long], String] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], tokens: Seq[String]): Map[String, Long] = {
    if (tokens == null || tokens.length < n) buf
    else {
      var m = buf
      var i = 0
      while (i + n <= tokens.length) {
        val g = tokens.slice(i, i + n).mkString(" ")
        m = m.updated(g, m.getOrElse(g, 0L) + 1L)
        i += 1
      }
      trim(m)
    }
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    trim(b.foldLeft(a) { case (m, (g, c)) => m.updated(g, m.getOrElse(g, 0L) + c) })

  override def finish(m: Map[String, Long]): String =
    m.toSeq.sortBy { case (g, c) => (-c, g) }.take(k)
      .map { case (g, c) => s"$g:$c" }.mkString("|")

  /** Bound buffer memory the way the reference bounds its histogram — at
    * corpus scale the map would otherwise grow with vocabulary^n. */
  private def trim(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= maxEntries) m
    else m.toSeq.sortBy { case (g, c) => (-c, g) }.take(maxEntries).toMap

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

/** Hive's `context_ngrams` (GenericUDAFContextNGrams.java): count the
  * fillers of the wildcard slots in a context pattern — e.g. context
  * ["table", null] counts words following "table". Same exact-count /
  * bounded-buffer / deterministic-top-k contract as [[NGramsAggregator]].
  */
class ContextNGramsAggregator(context: Seq[Option[String]], k: Int,
                              maxEntries: Int = 100000)
    extends Aggregator[Seq[String], Map[String, Long], String] {

  private val n = context.length

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], tokens: Seq[String]): Map[String, Long] = {
    if (tokens == null || tokens.length < n) buf
    else {
      var m = buf
      var i = 0
      while (i + n <= tokens.length) {
        var ok = true
        var j = 0
        while (ok && j < n) {
          context(j).foreach(w => if (tokens(i + j) != w) ok = false)
          j += 1
        }
        if (ok) {
          val filler = (0 until n).collect {
            case j if context(j).isEmpty => tokens(i + j)
          }.mkString(" ")
          m = m.updated(filler, m.getOrElse(filler, 0L) + 1L)
        }
        i += 1
      }
      trim(m)
    }
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    trim(b.foldLeft(a) { case (m, (g, c)) => m.updated(g, m.getOrElse(g, 0L) + c) })

  override def finish(m: Map[String, Long]): String =
    m.toSeq.sortBy { case (g, c) => (-c, g) }.take(k)
      .map { case (g, c) => s"$g:$c" }.mkString("|")

  private def trim(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= maxEntries) m
    else m.toSeq.sortBy { case (g, c) => (-c, g) }.take(maxEntries).toMap

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

object NGrams {

  /** Top-k bigrams per language via the custom UDAF; oracle-checked
    * against DuckDB's window-function equivalent. */
  val q83_ngrams_topk: Q = (s, d) => {
    import s.implicits._
    val ngrams2 = udaf(new NGramsAggregator(2, 5))
    Tables.documents(s, d)
      .select(col("lang"), split(trim(col("text")), " +").as("ts"))
      .groupBy(col("lang"))
      .agg(ngrams2(col("ts")).as("top_ngrams"))
      .orderBy(col("lang"))
  }

  /** context_ngrams(["table", null], 5): most frequent words following
    * "table", per source. */
  val q84_context_ngrams: Q = (s, d) => {
    import s.implicits._
    val follow = udaf(new ContextNGramsAggregator(Seq(Some("table"), None), 5))
    Tables.documents(s, d)
      .select(col("source"), split(trim(col("text")), " +").as("ts"))
      .groupBy(col("source"))
      .agg(follow(col("ts")).as("after_table"))
      .orderBy(col("source"))
  }

  /** The reference's SQL invocation form end to end: `ngrams(...)`
    * resolved through the registered Catalyst aggregate
    * (functions/HiveNGrams.scala; GraftExtensions injects it) with the
    * reference's `array<struct<ngram,estfrequency>>` result shape
    * (FunctionRegistry.java:398, GenericUDAFnGrams.java), flattened via
    * posexplode so the DuckDB oracle can replicate rank order. */
  val q312_ngrams_sql: Q = (s, d) => {
    Tables.registerAll(s, d)
    s.sql(
      """SELECT lang, pos AS rnk, concat_ws(' ', g.ngram) AS gram,
        |       g.estfrequency AS freq
        |FROM (SELECT lang, ngrams(split(trim(text), ' +'), 2, 5, 1000) AS gs
        |      FROM documents GROUP BY lang) t
        |LATERAL VIEW posexplode(gs) e AS pos, g
        |ORDER BY lang, rnk""".stripMargin)
  }

  /** `context_ngrams(seq, array('table', NULL), k)` SQL form — counts the
    * words filling the NULL slot after "table"
    * (GenericUDAFContextNGrams.java:279-303). */
  val q313_context_ngrams_sql: Q = (s, d) => {
    Tables.registerAll(s, d)
    s.sql(
      """SELECT source, pos AS rnk, concat_ws(' ', g.ngram) AS filler,
        |       g.estfrequency AS freq
        |FROM (SELECT source,
        |        context_ngrams(split(trim(text), ' +'),
        |                       array('table', CAST(NULL AS STRING)),
        |                       5, 1000) AS gs
        |      FROM documents GROUP BY source) t
        |LATERAL VIEW posexplode(gs) e AS pos, g
        |ORDER BY source, rnk""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    "q83_ngrams_topk" -> q83_ngrams_topk,
    "q84_context_ngrams" -> q84_context_ngrams,
    "q312_ngrams_sql" -> q312_ngrams_sql,
    "q313_context_ngrams_sql" -> q313_context_ngrams_sql,
  )

  val oracles: Map[String, String] = Map(
    "q312_ngrams_sql" ->
      """WITH w AS (SELECT lang, regexp_split_to_array(trim(text), ' +') AS ts
        |           FROM documents),
        |  b AS (SELECT lang, unnest([ts[i] || ' ' || ts[i+1]
        |                             for i in range(1, len(ts))]) AS bg FROM w),
        |  c AS (SELECT lang, bg, COUNT(1) AS cnt FROM b GROUP BY lang, bg),
        |  r AS (SELECT lang, bg, cnt,
        |          ROW_NUMBER() OVER (PARTITION BY lang
        |            ORDER BY cnt DESC, bg) AS rn FROM c)
        |SELECT lang, rn - 1 AS rnk, bg AS gram, CAST(cnt AS DOUBLE) AS freq
        |FROM r WHERE rn <= 5 ORDER BY lang, rnk""".stripMargin,
    "q313_context_ngrams_sql" ->
      """WITH w AS (SELECT source, regexp_split_to_array(trim(text), ' +') AS ts
        |           FROM documents),
        |  b AS (SELECT source, unnest([{'a': ts[i], 'b': ts[i+1]}
        |                               for i in range(1, len(ts))]) AS bg FROM w),
        |  c AS (SELECT source, bg.b AS filler, COUNT(1) AS cnt FROM b
        |        WHERE bg.a = 'table' GROUP BY source, bg.b),
        |  r AS (SELECT source, filler, cnt,
        |          ROW_NUMBER() OVER (PARTITION BY source
        |            ORDER BY cnt DESC, filler) AS rn FROM c)
        |SELECT source, rn - 1 AS rnk, filler, CAST(cnt AS DOUBLE) AS freq
        |FROM r WHERE rn <= 5 ORDER BY source, rnk""".stripMargin,
    "q83_ngrams_topk" ->
      """WITH w AS (SELECT lang, regexp_split_to_array(trim(text), ' +') AS ts
        |           FROM documents),
        |  b AS (SELECT lang, unnest([ts[i] || ' ' || ts[i+1]
        |                             for i in range(1, len(ts))]) AS bg FROM w),
        |  c AS (SELECT lang, bg, COUNT(1) AS cnt FROM b GROUP BY lang, bg),
        |  r AS (SELECT lang, bg, cnt,
        |          ROW_NUMBER() OVER (PARTITION BY lang
        |            ORDER BY cnt DESC, bg) AS rn FROM c)
        |SELECT lang, string_agg(bg || ':' || cnt, '|' ORDER BY rn) AS top_ngrams
        |FROM r WHERE rn <= 5 GROUP BY lang ORDER BY lang""".stripMargin,
    "q84_context_ngrams" ->
      """WITH w AS (SELECT source, regexp_split_to_array(trim(text), ' +') AS ts
        |           FROM documents),
        |  b AS (SELECT source, unnest([{'a': ts[i], 'b': ts[i+1]}
        |                               for i in range(1, len(ts))]) AS bg FROM w),
        |  c AS (SELECT source, bg.b AS filler, COUNT(1) AS cnt FROM b
        |        WHERE bg.a = 'table' GROUP BY source, bg.b),
        |  r AS (SELECT source, filler, cnt,
        |          ROW_NUMBER() OVER (PARTITION BY source
        |            ORDER BY cnt DESC, filler) AS rn FROM c)
        |SELECT source, string_agg(filler || ':' || cnt, '|' ORDER BY rn) AS after_table
        |FROM r WHERE rn <= 5 GROUP BY source ORDER BY source""".stripMargin,
  )
}
