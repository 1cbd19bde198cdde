package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, InsertableRelation, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import KvStore.{compareKeys, Meta, Segment}

/** The ENGINE half of the external-storage-handler contract — the
  * reference's HBaseStorageHandler + HiveHBaseTableInputFormat pair
  * (hbase-handler/src/java/org/apache/hadoop/hive/hbase/
  * HBaseStorageHandler.java:90 binds a Hive table onto an external
  * row-key store; its `decomposePredicate` hands rowkey conjuncts to the
  * store as a narrowed scan and returns the rest to Hive as residual),
  * re-expressed on the seam Spark provides for exactly this job: a
  * DataSource V2 connector.
  *
  * {{{
  *   spark.read.format("graftkv").load(dir)          // short name, or
  *   CREATE TABLE t USING graftkv LOCATION '<dir>'   // catalog-bound
  * }}}
  *
  * What the connector pushes INTO the store ([[KvStore]]) — mirroring
  * decomposePredicate's split:
  *
  *  - '''Column pruning''' (SupportsPushDownRequiredColumns): non-required
  *    columns are skipped at the byte level, never decoded.
  *  - '''Key-predicate pushdown''' (SupportsPushDownFilters): =, <, <=,
  *    >, >=, IN conjuncts on the key column become a [lo, hi] window;
  *    segments whose [min, max] range misses it are never opened (HBase
  *    region pruning); each surviving segment FAST-FORWARDS to the first
  *    key at/after `lo` (block-index seek: skipped rows decode key-only)
  *    and STOPS at the first key past `hi` (the region scan's
  *    start/stop-rows). Every filter — key
  *    predicates included — is also returned to Spark as residual, so the
  *    route is a sound superset exactly like the parquet reader's pushed
  *    filters: pruning can only skip rows the predicate rejects anyway.
  *
  * Scale: planInputPartitions emits one split per surviving segment —
  * a selective key lookup over a 10^5-segment 100 TB store plans a
  * handful of single-segment tasks; the full-scan case degrades to one
  * task per segment, the same parallelism any file source gets. The
  * bound computation reads only the one-line-per-segment meta.
  */
class KvSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graftkv"

  private def dirOf(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path")).orElse(Option(options.get("location")))
    require(p.nonEmpty, "graftkv needs a path (load(dir) or OPTIONS(path ...))")
    p.get
  }

  private def metaOf(options: CaseInsensitiveStringMap): Meta = {
    val dir = dirOf(options)
    val fs = new Path(dir).getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)
    KvStore.readMeta(fs, dir)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    metaOf(options).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new KvTable(dirOf(opts), metaOf(opts))
  }
}

final class KvTable(val dir: String, meta: Meta) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"graftkv $dir"
  override def schema(): StructType = meta.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
        TableCapability.TRUNCATE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KvScanBuilder(dir, meta)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new KvWriteBuilder(dir, meta, info)
}

/** Write half of the handler contract (the reference's
  * HiveHBaseTableOutputFormat direction: INSERT INTO an external-handler
  * table writes THROUGH the handler into the store). Exposed as a V1
  * write so both lanes route through [[KvStore]]'s existing committed
  * paths — INSERT OVERWRITE through the staged-swap full write (a
  * concurrent reader sees old or new, never half), INSERT INTO through
  * the append lane (new sorted segments + a single meta rewrite).
  * Either way the store-side governance chokepoints (INSERT, and DELETE
  * for the destructive overwrite) fire exactly as they do for the
  * programmatic API. Segment count for the incoming batch follows the
  * BATCH's own parallelism (capped) — sizing an append by the store's
  * current segment count would double the store every INSERT INTO
  * (2 -> 4 -> 8 ...), launching geometrically more range-shuffle tasks
  * for constant-size batches. An overwrite keeps at least the store's
  * granularity so a same-size rewrite does not collapse parallelism. */
final class KvWriteBuilder(dir: String, meta: Meta, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var overwrite = false
  override def truncate(): WriteBuilder = { overwrite = true; this }
  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      (data: org.apache.spark.sql.DataFrame, overwriteFlag: Boolean) => {
        val batchParallelism =
          math.min(64, math.max(1, data.rdd.getNumPartitions))
        if (overwrite || overwriteFlag)
          KvStore.write(data.sparkSession, data, dir, meta.keyCol,
            math.max(batchParallelism, meta.segments.length))
        else KvStore.append(data.sparkSession, data, dir, batchParallelism)
      }
  }
}

final class KvScanBuilder(dir: String, meta: Meta)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = meta.schema
  private var accepted: Array[Filter] = Array.empty
  // inclusive bounds; None = unbounded on that side
  private var lo: Option[Any] = None
  private var hi: Option[Any] = None
  // point set from IN/= conjuncts: lets segment pruning keep only
  // segments containing SOME point, not the whole [min,max] span —
  // IN (first_key, last_key) over a 10^5-segment store plans 2 splits,
  // not 10^5 (HBase multi-get vs span scan)
  private var points: Option[Seq[Any]] = None

  private def intersectPoints(vs: Seq[Any]): Unit =
    points = Some(points match {
      case None => vs
      case Some(cur) => cur.filter(c => vs.exists(v => compareKeys(c, v) == 0))
    })

  private def keyVal(v: Any): Option[Any] =
    if (meta.keyIsString) v match { case s: String => Some(s); case _ => None }
    else v match { case n: java.lang.Number => Some(n.longValue()); case _ => None }

  private def tightenLo(v: Any): Unit =
    lo = Some(lo.filter(cur => compareKeys(cur, v) >= 0).getOrElse(v))
  private def tightenHi(v: Any): Unit =
    hi = Some(hi.filter(cur => compareKeys(cur, v) <= 0).getOrElse(v))

  /** Conjunct split, decomposePredicate-style: key-window conjuncts feed
    * the store-side bounds AND are reported as pushed; everything —
    * including them — comes back as residual for Spark to re-apply
    * (superset soundness; exclusive bounds are widened to inclusive). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val key = meta.keyCol
    filters.foreach {
      case EqualTo(c, v) if c == key => keyVal(v).foreach { k =>
        tightenLo(k); tightenHi(k); intersectPoints(Seq(k)); accepted :+= EqualTo(c, v) }
      case GreaterThan(c, v) if c == key => keyVal(v).foreach { k =>
        tightenLo(k); accepted :+= GreaterThan(c, v) }
      case GreaterThanOrEqual(c, v) if c == key => keyVal(v).foreach { k =>
        tightenLo(k); accepted :+= GreaterThanOrEqual(c, v) }
      case LessThan(c, v) if c == key => keyVal(v).foreach { k =>
        tightenHi(k); accepted :+= LessThan(c, v) }
      case LessThanOrEqual(c, v) if c == key => keyVal(v).foreach { k =>
        tightenHi(k); accepted :+= LessThanOrEqual(c, v) }
      case In(c, vs) if c == key && vs.nonEmpty =>
        val ks = vs.flatMap(keyVal)
        if (ks.length == vs.length) {
          tightenLo(ks.min(Ordering.fromLessThan[Any](compareKeys(_, _) < 0)))
          tightenHi(ks.max(Ordering.fromLessThan[Any](compareKeys(_, _) < 0)))
          intersectPoints(ks.toSeq)
          accepted :+= In(c, vs)
        }
      case _ => // residual-only: the store cannot narrow on it
    }
    filters
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve store column order; Spark's projection above maps by name
    val want = requiredSchema.fieldNames.toSet
    required = StructType(meta.schema.fields.filter(f => want(f.name)))
  }

  override def build(): Scan = new KvScan(dir, meta, required, lo, hi, points)
}

final class KvScan(dir: String, meta: Meta, required: StructType,
                   lo: Option[Any], hi: Option[Any],
                   points: Option[Seq[Any]] = None) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  private def survives(s: Segment): Boolean =
    lo.forall(l => compareKeys(s.maxKey, l) >= 0) &&
      hi.forall(h => compareKeys(s.minKey, h) <= 0) &&
      // point-set predicates: the segment must contain SOME point —
      // [min,max]-window survival alone keeps every segment BETWEEN two
      // IN values (and the residual filter then reads them for nothing)
      points.forall(_.exists(p =>
        compareKeys(s.minKey, p) <= 0 && compareKeys(s.maxKey, p) >= 0))

  private lazy val pruned: Seq[Segment] = meta.segments.filter(survives)

  override def description(): String =
    s"graftkv $dir keyBounds=[${lo.getOrElse("-inf")},${hi.getOrElse("+inf")}] " +
      points.map(p => s"keyPoints=${p.length} ").getOrElse("") +
      s"segments=${pruned.length}/${meta.segments.length}"

  override def planInputPartitions(): Array[InputPartition] =
    pruned.map(s => KvPartition(s.file): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    // required ships as a NAME LIST, not DDL: a count(*) prunes every
    // column and StructType.fromDDL("") is a parse error. The session's
    // Hadoop conf ships too — executors must open segments with the
    // driver's filesystem settings, not an empty default.
    new KvReaderFactory(dir, meta.schema.toDDL, required.fieldNames.toSeq,
      meta.keyCol, hi.map(KvPartition.enc), lo.map(KvPartition.enc),
      new KvStore.SerConf(SparkSession.active.sparkContext.hadoopConfiguration))
}

final case class KvPartition(file: String) extends InputPartition

object KvPartition {
  // bounds ship to executors as strings (keys are Long or String only)
  private[sources] def enc(k: Any): String = k match {
    case l: Long => s"L$l"
    case s: String => "S" + s
  }
  private[sources] def dec(s: String): Any =
    if (s.startsWith("L")) s.drop(1).toLong else s.drop(1)
}

final class KvReaderFactory(dir: String, fullDdl: String, requiredNames: Seq[String],
                            keyCol: String, stopAtEnc: Option[String],
                            startAtEnc: Option[String],
                            conf: KvStore.SerConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[KvPartition].file
    val fs = new Path(dir).getFileSystem(conf.conf)
    val full = StructType.fromDDL(fullDdl)
    val want = requiredNames.toSet
    val it = new KvStore.SegmentReader(fs, dir, file,
      full, StructType(full.fields.filter(f => want(f.name))),
      keyCol, stopAtEnc.map(KvPartition.dec), startAtEnc.map(KvPartition.dec))
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow = cur
      override def close(): Unit = it.close()
    }
  }
}
