package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.HiveHash
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Hive-compatibility shims (SURVEY.md §2.3, §1.2):
  *
  *  - `hive_hash`: Hive's ObjectInspectorUtils.hashCode family — Spark
  *    ships the exact algorithm as catalyst HiveHash (used for Hive
  *    bucketing interop); registered here as a SQL function so bucket
  *    placement (`hash(cols) % numBuckets`) matches the reference
  *    byte-for-byte, making TABLESAMPLE(BUCKET x OUT OF y ON cols)
  *    Hive-bucket-compatible.
  *  - `field(needle, v1..vn)` (FunctionRegistry.java:183-269): 1-based
  *    index of first match, 0 if absent — composed as a CaseWhen chain
  *    (codegen'd).
  *  - uniontype shim (§1.2): encode `uniontype<T0,T1,...>` as
  *    struct(tag, field0..fieldN) — the same encoding Spark's Hive
  *    compatibility layer uses; create_union/extract_union helpers.
  */
object HiveCompat {

  def registerHiveHash(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hive_hash", es => HiveHash(es), "scala_udf")

  def hive_hash(cols: Column*): Column = call_function("hive_hash", cols: _*)

  /** Hive `field`: 1-based position of needle among values, else 0. */
  def field(needle: Column, values: Column*): Column =
    values.zipWithIndex.reverse.foldLeft(lit(0)) {
      case (els, (v, i)) => when(needle === v, lit(i + 1)).otherwise(els)
    }

  /** uniontype<T...> value: struct(tag byte, field0..fieldN) with only
    * the active field non-null. */
  def create_union(tag: Column, values: Column*): Column =
    struct((tag.cast("byte").as("tag") +:
      values.zipWithIndex.map { case (v, i) =>
        when(tag === i, v).as(s"field$i")
      }): _*)

  /** extract_union(u): the struct itself; extract_union(u, i): field i. */
  def extract_union(u: Column): Column = u
  def extract_union(u: Column, tag: Int): Column = u.getField(s"field$tag")

  /** Hive-bucket-compatible sampling: BUCKET x OUT OF y ON cols using
    * hive_hash — rows land in the same buckets the reference would
    * assign (SamplePruner semantics, §2.8). */
  def bucketSampleOn(df: org.apache.spark.sql.DataFrame, x: Int, y: Int,
                     cols: Column*): org.apache.spark.sql.DataFrame = {
    registerHiveHash(df.sparkSession)
    df.filter(pmod(hive_hash(cols: _*), lit(y)) === (x - 1))
  }

  /** hive_hash + field + union shim over part (rows-only; values pinned
    * by HiveCompatSpec — no DuckDB analog for Hive's hash). */
  val q85_hive_compat: Q = (s, d) => {
    registerHiveHash(s)
    val u = create_union((col("p_size") % 2).cast("int"),
      col("p_name"), col("p_retailprice").cast("string"))
    Tables.part(s, d)
      .filter(col("p_partkey") < 300)
      .select(
        col("p_partkey"),
        hive_hash(col("p_brand")).as("brand_hash"),
        hive_hash(col("p_partkey"), col("p_size")).as("multi_hash"),
        field(col("p_type"), lit("ECONOMY"), lit("SMALL"), lit("PROMO"),
              lit("STANDARD"), lit("MEDIUM"), lit("LARGE")).as("type_rank"),
        u.as("u").getField("tag").as("u_tag"),
        extract_union(u, 0).as("u_name"),
        extract_union(u, 1).as("u_price"))
      .orderBy(col("p_partkey"))
  }

  /** Hive-bucket sampling: partition counts per bucket over 4 buckets
    * (rows-only; coverage invariant pinned in spec). */
  val q86_bucket_on_hash: Q = (s, d) => {
    registerHiveHash(s)
    Tables.lineitem(s, d)
      .groupBy(pmod(hive_hash(col("l_suppkey")), lit(4)).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))
  }

  val queries: Map[String, Q] = Map(
    "q85_hive_compat" -> q85_hive_compat,
    "q86_bucket_on_hash" -> q86_bucket_on_hash,
  )

  val oracles: Map[String, String] = Map.empty
}
