package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality auditing — the constraint layer the
  * reference leaves to convention (Hive 2.1 has no enforced PRIMARY
  * KEY/NOT NULL; its users run exactly these hand-rolled violation
  * queries after every load, cf. the checkstyle-ish assertions scattered
  * through the stats queries under ql/src/test/queries/clientpositive).
  * Here they are one API with the right 100 TB plan:
  *
  *  - every ROW-LOCAL rule (null / range / format) compiles into ONE
  *    conditional-aggregation pass — auditing 10 such rules costs one
  *    scan, not ten;
  *  - [[Unique]] costs one group-by on its key columns (count-minus-one
  *    summed over groups = excess rows);
  *  - [[ForeignKey]] costs one left-anti join against the (distinct)
  *    dimension keys — broadcast-sized when the dimension is.
  *
  * The report is a DataFrame of (rule, violations) — no driver-side
  * collect; lanes union lazily so Spark schedules the slivers together.
  */
object DataQuality {

  sealed trait Rule { def name: String }

  /** Column must be non-null. */
  final case class NotNull(column: String) extends Rule {
    def name = s"not_null($column)"
  }

  /** Value must lie in [lo, hi]. NULLs pass (that is NotNull's job). */
  final case class InRange(column: String, lo: Double, hi: Double) extends Rule {
    def name = s"in_range($column)"
  }

  /** String must match the regex (partial match, rlike semantics).
    * NULLs pass. */
  final case class Matches(column: String, regex: String) extends Rule {
    def name = s"matches($column)"
  }

  /** The column tuple must be unique; violations = excess rows beyond
    * the first per duplicated key. */
  final case class Unique(columns: Seq[String]) extends Rule {
    def name = s"unique(${columns.mkString(",")})"
  }

  /** Every non-null value must appear in `dimKey` of `dim`; violations
    * = orphan rows. */
  final case class ForeignKey(column: String, dim: DataFrame, dimKey: String) extends Rule {
    def name = s"foreign_key($column)"
  }

  private def violationExpr(r: Rule): Column = r match {
    case NotNull(c) => count(when(col(c).isNull, 1))
    case InRange(c, lo, hi) => count(when(col(c) < lo || col(c) > hi, 1))
    case Matches(c, re) => count(when(!col(c).rlike(re), 1))
    case other => throw new IllegalArgumentException(s"not row-local: $other")
  }

  /** Audit `df` against `rules`; returns (rule, violations) with rule
    * names prefixed `prefix.`. Rule order is preserved in the lanes but
    * callers should ORDER BY for a stable report. */
  def audit(df: DataFrame, prefix: String, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    val (rowLocal, heavy) = rules.partition {
      case _: NotNull | _: InRange | _: Matches => true
      case _ => false
    }
    val lanes = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (rowLocal.nonEmpty) {
      // one scan for every row-local rule: agg lanes then unpivot the 1-row result
      val agged = df.agg(violationExpr(rowLocal.head).as("c0"),
        rowLocal.tail.zipWithIndex.map { case (r, i) => violationExpr(r).as(s"c${i + 1}") }: _*)
      val pairs = rowLocal.zipWithIndex.map { case (r, i) =>
        struct(lit(s"$prefix.${r.name}").as("rule"), col(s"c$i").as("violations"))
      }
      lanes += agged.select(explode(array(pairs: _*)).as("kv"))
        .select(col("kv.rule"), col("kv.violations"))
    }
    heavy.foreach {
      case u @ Unique(cols) =>
        lanes += df.groupBy(cols.map(col): _*).count()
          .agg(coalesce(sum(col("count") - 1), lit(0L)).as("violations"))
          .select(lit(s"$prefix.${u.name}").as("rule"), col("violations"))
      case f @ ForeignKey(c, dim, dk) =>
        lanes += df.select(col(c)).filter(col(c).isNotNull)
          .join(dim.select(col(dk).as(c)).distinct(), Seq(c), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(s"$prefix.${f.name}").as("rule"), col("violations"))
      case other => throw new IllegalArgumentException(s"unhandled rule: $other")
    }
    lanes.reduce(_.unionByName(_))
  }
}
