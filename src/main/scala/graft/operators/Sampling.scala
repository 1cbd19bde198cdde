package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Sampling surface (SURVEY.md §2.8): TABLESAMPLE(BUCKET x OUT OF y ON
  * cols) — parse/FromClauseParser.g:167, optimizer/SamplePruner.java.
  *
  * The bucket function here is `pmod(key, y)` rather than Hive's
  * `hash(cols) % y`: deterministic, cross-engine reproducible, and at
  * 100 TB it prunes identically (with bucketed tables the predicate
  * becomes partition-file pruning). Row-fraction sampling
  * (`TABLESAMPLE (n PERCENT)`) maps to df.sample — nondeterministic
  * across engines, so it is covered by spec tests, not the oracle.
  */
object Sampling {

  /** BUCKET x OUT OF y ON key — deterministic modulo sampling. The
    * reference rejects a bucket numerator above the denominator at
    * semantic-analysis time (SemanticAnalyzer's sample clause check);
    * without this guard the filter is silently empty. */
  def bucketSample(df: DataFrame, key: Column, x: Int, y: Int): DataFrame = {
    require(x >= 1 && y >= 1 && x <= y,
      s"bucket numerator must be in [1, $y], got $x (TABLESAMPLE BUCKET $x OUT OF $y)")
    df.filter(pmod(key, lit(y)) === (x - 1))
  }

  /** Bucket-sample lineitem 1 OUT OF 7 on orderkey, then aggregate. */
  val q55_bucket_sample: Q = (s, d) => {
    bucketSample(Tables.lineitem(s, d), col("l_orderkey"), 4, 7)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** TABLESAMPLE (n ROWS): deterministic row cap. Hive takes the first n
    * rows per split; the engine pins a total order first so the sample is
    * reproducible across partitionings and engines (limit pushes into a
    * TakeOrderedAndProject — no global sort materializes). */
  val q110_sample_rows: Q = (s, d) => {
    Tables.lineitem(s, d)
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .limit(100)
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"),
           max(col("l_orderkey")).as("max_key"))
  }

  val queries: Map[String, Q] = Map(
    "q55_bucket_sample" -> q55_bucket_sample,
    "q110_sample_rows" -> q110_sample_rows,
  )

  val oracles: Map[String, String] = Map(
    "q55_bucket_sample" ->
      """SELECT l_returnflag, COUNT(1) AS n, SUM(l_quantity) AS sum_qty
        |FROM lineitem WHERE l_orderkey % 7 = 3
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q110_sample_rows" ->
      """SELECT COUNT(1) AS n, SUM(l_quantity) AS sum_qty, MAX(l_orderkey) AS max_key
        |FROM (SELECT l_quantity, l_orderkey FROM lineitem
        |      ORDER BY l_orderkey, l_linenumber LIMIT 100) t""".stripMargin,
  )
}
