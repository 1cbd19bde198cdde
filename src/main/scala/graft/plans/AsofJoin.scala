package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.SqlShims
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** AS-OF JOIN — a whole-operator extension (logical node + strategy +
  * physical sort-merge exec) for the one join shape neither the
  * reference nor stock Spark can express as an equi-join: for every left
  * row, the single latest right row with the same key and
  * `rightTime <= leftTime` (optionally within `toleranceUs`).
  *
  * Training-data pipelines hit this constantly: attribute a purchase to
  * the last preceding view, stamp each document with the most recent
  * crawl snapshot, align sensor reads to the nearest earlier calibration.
  * The window-function rewrite (union both sides, last_value over a
  * time-ordered window, filter back) shuffles the UNION of both tables
  * and materializes a window frame per row; this operator instead:
  *
  *  - requires only ClusteredDistribution on each side's key (one
  *    exchange per side at most — co-partitioned/bucketed inputs skip
  *    it entirely, exactly like SortMergeJoin);
  *  - requires (key, time) ascending sort per partition, satisfied by
  *    local sort, and preserves the left side's partitioning and
  *    ordering for downstream operators;
  *  - merges the two sorted streams in ONE forward pass per partition —
  *    O(|L| + |R|) with O(1) state (the current candidate row), no
  *    window buffer, no per-row binary search, spill-free at any key
  *    cardinality or time depth.
  *
  * Left rows with no qualifying match emit null right columns (left
  * as-of semantics, matching DuckDB's `ASOF LEFT JOIN`, which serves as
  * the correctness oracle). Ties on the maximal right time resolve to
  * the LAST such row in (key, time) sort order; queries that need
  * hash-stable output should project time-derived values or make the
  * right side unique per (key, time).
  */
case class AsofJoin(
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    toleranceUs: Option[Long],
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoin]] to [[AsofJoinExec]]; injected via GraftExtensions
  * (the engine's SparkSessionExtensions hook). */
class AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(lk, rk, lt, rt, tol, l, r) =>
      AsofJoinExec(lk, rk, lt, rt, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join: both children clustered on their keys and
  * sorted by (keys, time); one forward merge pass per partition. */
case class AsofJoinExec(
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    toleranceUs: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  require(leftTime.dataType == rightTime.dataType,
    s"as-of time columns must share a type: ${leftTime.dataType} vs ${rightTime.dataType}")
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of key columns must share types pairwise")
  if (toleranceUs.isDefined) {
    // DateType is deliberately NOT accepted: date subtraction yields
    // DAYS, so a microsecond tolerance would be silently always-true.
    // Tolerance is in the time column's NATIVE unit — microseconds for
    // timestamps (both TZ and NTZ store micros-since-epoch as long,
    // mirroring the reference's timezone-less TIMESTAMP,
    // serde/.../TypeInfoFactory.java:56-57), the raw value for int/long.
    val ok = Seq(TimestampType, TimestampNTZType, LongType, IntegerType)
    require(ok.contains(leftTime.dataType),
      s"as-of tolerance needs a timestamp or int/long time column, got " +
        s"${leftTime.dataType}" + (if (leftTime.dataType == DateType)
          " (dates subtract in DAYS, not microseconds — cast to timestamp " +
          "or use an integer day count)" else ""))
  }

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // the merge emits left rows in their incoming order, one output row per
  // left row — left partitioning AND ordering survive for downstream ops
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTimeB = leftTime
    val rTimeB = rightTime
    val tol = toleranceUs
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeB), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeB), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeysB.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTimeB.dataType))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(output, output)
      val rBuf = rIter.buffered

      new Iterator[InternalRow] {
        // latest right row (copied out of the stream) with key <= the
        // left cursor's key and time <= its time; O(1) state total
        private var cand: InternalRow = _
        private var candKey: InternalRow = _
        private var candTime: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTime = lTimeProj(l)
          // SQL equality semantics: a NULL key or time never matches.
          // Null keys/times sort FIRST (ascending), so null-keyed right
          // rows are consumed and skipped before any non-null left key.
          val lNull = lKey.anyNull || lTime.isNullAt(0)
          var scan = true
          while (scan && rBuf.hasNext) {
            val rKey = rKeyProj(rBuf.head)
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) rBuf.next() // behind the left key: discard
            else if (c > 0) scan = false // ahead: stop, keep for later
            else {
              val rTime = rTimeProj(rBuf.head)
              if (rKey.anyNull || rTime.isNullAt(0)) rBuf.next() // never matchable
              else if (timeOrd.compare(rTime, lTime) <= 0) {
                // newest-so-far match: overwrite the candidate
                cand = rBuf.head.copy()
                candKey = rKey.copy()
                candTime = rTime.copy()
                rBuf.next()
              } else scan = false // in the future relative to this left row
            }
          }
          // left rows with the same key only move forward in time, so a
          // candidate stays valid until the key changes
          val matched = !lNull && cand != null &&
            keyOrd.compare(candKey, lKey) == 0 &&
            tol.forall(t => timeLong(lTime) - timeLong(candTime) <= t)
          resultProj(if (matched) joined(l, cand) else joined(l, nullRight))
        }
      }
    }
  }

  private def timeLong(timeRow: InternalRow): Long = leftTime.dataType match {
    case IntegerType | DateType => timeRow.getInt(0).toLong
    case _ => timeRow.getLong(0)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entry point. */
object Asof {

  /** Left as-of join: one output row per `left` row, joined to the
    * latest `right` row with equal keys and `rightTime <= leftTime`
    * (within `toleranceUs` when given), null right columns otherwise.
    * Right column names must not collide with left ones (alias first —
    * same contract as Dataset.joinWith's disambiguation).
    *
    * `toleranceUs` is in the time column's NATIVE unit: microseconds for
    * TimestampType, the raw value for int/long times. DateType time
    * columns reject a tolerance (date subtraction is in days — cast to
    * timestamp or use an integer day count instead). */
  def join(left: DataFrame, right: DataFrame,
           leftKeys: Seq[String], rightKeys: Seq[String],
           leftTime: String, rightTime: String,
           toleranceUs: Option[Long] = None): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
      "as-of join needs matching non-empty key lists")
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"ambiguous columns across as-of sides: $dup — alias first")
    val lPlan = SqlShims.analyzed(left)
    // re-alias the right side when it shares lineage with the left
    // (self-as-of): fresh exprIds keep the plan unambiguous, the same
    // dedup the analyzer performs for stock Join nodes
    val rightSafe =
      if (SqlShims.analyzed(right).outputSet.intersect(lPlan.outputSet).isEmpty) right
      else right.select(right.columns.map(c => col(c).as(c)).toIndexedSeq: _*)
    val rPlan = SqlShims.analyzed(rightSafe)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in [${plan.output.map(_.name).mkString(", ")}]"))
    val (lt, rt) = (attr(lPlan, leftTime), attr(rPlan, rightTime))
    require(lt.dataType == rt.dataType,
      s"as-of time columns must share a type: ${lt.dataType} vs ${rt.dataType}")
    require(!(toleranceUs.isDefined && lt.dataType == DateType),
      "as-of tolerance over DateType is rejected: dates subtract in DAYS, " +
        "not microseconds — cast to timestamp or use an integer day count")
    val (lk, rk) = (leftKeys.map(attr(lPlan, _)), rightKeys.map(attr(rPlan, _)))
    require(lk.map(_.dataType) == rk.map(_.dataType),
      "as-of key columns must share types pairwise")
    SqlShims.ofRows(left.sparkSession, AsofJoin(
      lk, rk, lt, rt, toleranceUs, lPlan, rPlan))
  }
}
