package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Skewed tables / list bucketing — `CREATE TABLE ... SKEWED BY (c) ON
  * ('v1','v2') STORED AS DIRECTORIES` (reference: ql/src/java/org/apache/
  * hadoop/hive/ql/parse/HiveParser.g tableSkewed,
  * ql/optimizer/listbucketingpruner/ListBucketingPruner.java:57): rows
  * whose skew-column value is one of the declared hot values are stored
  * in that value's OWN directory; everything else lands in the shared
  * default directory (Hive's HIVE_DEFAULT_LIST_BUCKETING_DIR_NAME). A
  * point query on a hot value then reads one directory; a point query on
  * a cold value reads only the default directory — the compiler prunes,
  * the query text never changes.
  *
  * Spark-first: the layout IS a partitioned write on a derived routing
  * column (`__skew_dir`), so the default directory and per-value
  * directories fall out of the native partitioned sink, and pruning is
  * native partition pruning once [[graft.plans.SkewRoute]] (the
  * ListBucketingPruner analog) conjoins the routing predicate. Unlike a
  * plain `partitionBy(c)`, the cold values do NOT fan out into millions
  * of tiny directories — that is the entire point of list bucketing at
  * 100 TB: per-directory layout for the handful of hot values that repay
  * it, one healthy-sized default directory for the long tail.
  *
  * The data files keep the original column (the routing column is the
  * one consumed by the directory layout), so readers see the table
  * schema unchanged via [[read]].
  *
  * Layout invariant (same as the reference's): rows reach directories
  * only through [[write]]. Hand-appending a hot-value row into the
  * default directory breaks pruning the same way it breaks Hive's.
  */
object SkewedTables {

  /** Routing/layout column name; never visible through [[read]]. */
  val DirCol = "__skew_dir"

  /** The shared cold-values directory value (the
    * HIVE_DEFAULT_LIST_BUCKETING_DIR_NAME analog). */
  val Default = "__SKEW_DEFAULT__"

  final case class SkewMeta(column: String, values: Set[String])

  private val sidecarName = "_skew.json"

  /** Write `df` list-bucketed on string column `column` with hot values
    * `skewedValues`. Persists a sidecar so any later session can
    * re-register the layout, and registers for transparent pruning in
    * this one. */
  def write(df: DataFrame, dir: String, column: String,
            skewedValues: Seq[String],
            mode: SaveMode = SaveMode.Overwrite): Unit = {
    val field = df.schema.find(_.name.equalsIgnoreCase(column)).getOrElse(
      throw new IllegalArgumentException(s"skewed write: no column '$column'"))
    require(field.dataType == StringType,
      s"skewed write: SKEWED BY column must be STRING (got ${field.dataType} " +
        "for '" + column + "') — hot-value routing compares directory names")
    require(skewedValues.nonEmpty, "skewed write: ON () value list is empty")
    require(!skewedValues.contains(Default),
      s"skewed write: '$Default' is the reserved default-directory name")
    if (mode == SaveMode.Append) {
      // an Append under DIFFERENT skew metadata would leave already-written
      // directories routed by the OLD layout while the sidecar describes the
      // new one — silent wrong pruning; the reference forbids altering
      // skewed-info on populated list-bucketed partitions for the same reason
      readSidecar(df.sparkSession, dir).foreach { existing =>
        require(existing.column.equalsIgnoreCase(field.name) &&
                existing.values == skewedValues.toSet,
          s"skewed append: layout mismatch — existing sidecar is SKEWED BY " +
            s"(${existing.column}) ON (${existing.values.toSeq.sorted.mkString(",")}), " +
            s"append declares (${field.name}) ON (${skewedValues.sorted.mkString(",")}); " +
            "rewrite the table (Overwrite) to change the skew layout")
      }
    }
    df.withColumn(DirCol,
        when(col(column).isin(skewedValues: _*), col(column)).otherwise(lit(Default)))
      .write.mode(mode).partitionBy(DirCol).parquet(dir)
    val spark = df.sparkSession
    writeSidecar(spark, dir, SkewMeta(field.name, skewedValues.toSet))
    SkewCatalog.register(dir, SkewMeta(field.name, skewedValues.toSet))
  }

  /** Read a skewed table: schema is the original one (the routing column
    * is layout, not data), and the layout is (re-)registered so plain
    * filters on the skew column prune directories transparently. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    readSidecar(spark, dir).foreach(m => SkewCatalog.register(dir, m))
    spark.read.parquet(dir).drop(DirCol)
  }

  private def writeSidecar(spark: SparkSession, dir: String, meta: SkewMeta): Unit = {
    val path = new org.apache.hadoop.fs.Path(dir, sidecarName)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(
      s"""{"column":"${meta.column}","values":[${meta.values.toSeq.sorted
        .map(v => "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
        .mkString(",")}]}""".getBytes("UTF-8"))
    finally out.close()
  }

  private def readSidecar(spark: SparkSession, dir: String): Option[SkewMeta] = {
    val path = new org.apache.hadoop.fs.Path(dir, sidecarName)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return None
    val in = fs.open(path)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    // sidecar is engine-written; parse with the same minimal shape
    val colRe = """"column"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    val valsRe = """"values"\s*:\s*\[(.*)\]""".r
    val itemRe = """"((?:[^"\\]|\\.)*)"""".r
    for {
      c <- colRe.findFirstMatchIn(text).map(_.group(1))
      vs <- valsRe.findFirstMatchIn(text).map(_.group(1))
    } yield SkewMeta(unescape(c),
      itemRe.findAllMatchIn(vs).map(m => unescape(m.group(1))).toSet)
  }

  private def unescape(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")
}

/** Registered skewed-table layouts, keyed by normalized directory — the
  * metastore's skewed-info (org.apache.hadoop.hive.metastore.api
  * .SkewedInfo) analog, consulted by [[graft.plans.SkewRoute]]. */
object SkewCatalog {

  private val byPath = new ConcurrentHashMap[String, SkewedTables.SkewMeta]()

  def register(dir: String, meta: SkewedTables.SkewMeta): Unit =
    byPath.put(graft.PathKeys.normalize(dir), meta)

  def drop(dir: String): Unit = byPath.remove(graft.PathKeys.normalize(dir))
  def clear(): Unit = byPath.clear()
  def isEmpty: Boolean = byPath.isEmpty

  private[graft] def lookup(rootPath: org.apache.hadoop.fs.Path): Option[SkewedTables.SkewMeta] =
    Option(byPath.get(rootPath.toUri.getPath.stripSuffix("/")))
}
