package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ElementAt, GetArrayItem, Literal, StringSplit, SubstringIndex}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: `element_at(split(s, d), 1)` (and the `[0]` indexing
  * form) -> `substring_index(s, d, 1)` when `d` is a literal with no
  * regex metacharacters and split has no limit.
  *
  * First-token extraction is everywhere in log/text pipelines; the split
  * form materializes the WHOLE token array per row just to keep the first
  * element, while substring_index stops at the first delimiter — the kind
  * of row-level rewrite the reference does in its optimizer rule stack
  * (ql/src/java/org/apache/hadoop/hive/ql/optimizer/Optimizer.java:72-249)
  * and Spark lets us inject via SparkSessionExtensions.
  *
  * Semantics are identical for literal delimiters: split never returns an
  * empty array (minimum [""]), so index 1 always exists, and
  * substring_index of a delimiter-free string is the whole string — same
  * result. Regex delimiters or explicit limits don't match the pattern
  * and are left untouched.
  */
object FirstTokenRewrite extends Rule[LogicalPlan] {

  private val regexMeta = "\\.[]{}()*+?^$|".toSet

  private def literalDelim(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    e match {
      case Literal(d: UTF8String, StringType) =>
        d != null && d.toString.nonEmpty && !d.toString.exists(regexMeta)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ElementAt(StringSplit(str, delim, Literal(-1, _)), Literal(1, _), None, _)
        if literalDelim(delim) =>
      SubstringIndex(str, delim, Literal(1))
    case GetArrayItem(StringSplit(str, delim, Literal(-1, _)), Literal(0, _), _)
        if literalDelim(delim) =>
      SubstringIndex(str, delim, Literal(1))
  }
}
