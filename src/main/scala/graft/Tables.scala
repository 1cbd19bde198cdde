package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Mirrors the reference's table catalog (Hive metastore,
  * metastore/src/java/org/apache/hadoop/hive/metastore/ObjectStore.java) in
  * the simplest Spark-native way: parquet directories + temp views. At 100 TB
  * these would be catalog tables partitioned/bucketed on their join keys; the
  * loaders keep all access behind one chokepoint so that swap is local.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Schema catalog for the fixture tables — the metastore's job, done
    * once per JVM instead of once per query: a bare
    * `spark.read.parquet(path)` re-infers the schema (footer read +
    * file listing) on EVERY call, ~70 ms here, and the SQL-surface
    * queries that register all ten views paid ~0.9 s per invocation
    * just re-deriving schemas of immutable files (measured r15; guide
    * §1 "measure first", §6 metadata costs). A real deployment reads
    * table schemas from the catalog — this cache is that contract for
    * the path-addressed fixtures. METADATA only (a StructType per
    * path): every query still scans the parquet data itself on every
    * invocation; nothing row- or result-shaped is retained. Keyed by
    * the full path; the fixture dirs are driver-generated and
    * read-only, so a path's schema cannot change within a JVM. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path, p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** Register every table as a temp view (for spark.sql-surface queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach {
      case "events" => events(spark, dir).createOrReplaceTempView("events")
      case n => load(spark, dir, n).createOrReplaceTempView(n)
    }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts normalization chokepoint. The driver has shipped the column
    * under three parquet encodings across rounds; every engine entry point
    * reads events through here so the downstream operators (sessionize,
    * as-of, range joins, watermarks) can assume exactly one type:
    *   - TIMESTAMP(NANOS) + spark.sql.legacy.parquet.nanosAsLong=true →
    *     nanos long; integer-divide to micros (no double round-trip: nanos
    *     exceed 2^53) and rebuild a TimestampType.
    *   - TIMESTAMP(isAdjustedToUTC=false, MICROS) → Spark 4 TIMESTAMP_NTZ;
    *     cast to TimestampType — semantics-preserving because the session
    *     timezone is pinned to UTC (Session.configure), so wall-clock ==
    *     instant. This mirrors the reference, whose TIMESTAMP is
    *     timezone-less (serde/.../TypeInfoFactory.java:56-57) and is
    *     interpreted in the cluster's fixed zone.
    *   - TimestampType → pass through. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Scale-adaptive scan-parallelism recovery (optimization guide §2.5,
    * "input skew: one huge unsplittable file"). The driver's fixture
    * tables are single parquet files with ONE row group, so a scan —
    * and every codegen stage fused onto it (explodes, partial
    * aggregates, quality projections) — runs as ONE task regardless of
    * `local[N]`. Repartitioning right after the read spreads that
    * per-row compute across the session's parallelism.
    *
    * Scale safety: the repartition fires ONLY while the input is small
    * — total scan bytes below shufflePartitions x maxPartitionBytes,
    * i.e. exactly the regime where the file split count cannot reach
    * the configured parallelism. At production scale (many files /
    * row groups) the condition is false and this is a literal no-op —
    * no shuffle is added. Both inputs are confs, not constants, so the
    * driver's lower-core bench runs scale the decision with
    * SPARK_GRAFT_CPUS.
    *
    * `keys` picks hash partitioning (deterministic row placement, no
    * sort-before-repartition, and downstream groupBy/join on the same
    * keys reuses the exchange); pass a high-cardinality column. With no
    * keys it falls back to round-robin. Callers must not use it under
    * order/partition-sensitive operators (sampling, input_file_name,
    * monotonically_increasing_id) — every current call site feeds
    * key-deterministic aggregates/joins only. */
  def spread(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    val conf = df.sparkSession.sessionState.conf
    val p = conf.numShufflePartitions
    val small = BigInt(p.toLong) * conf.filesMaxPartitionBytes
    if (p > 1 && df.queryExecution.optimizedPlan.stats.sizeInBytes < small) {
      if (keys.isEmpty) df.repartition(p) else df.repartition(p, keys: _*)
    } else df
  }
}
