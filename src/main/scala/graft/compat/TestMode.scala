package graft.compat

import java.util.regex.Matcher

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier

/** `hive.test.mode` statement rewrites (SemanticAnalyzer.java:10187-10240,
  * BaseSemanticAnalyzer.java:1010-1015): when the conf is on,
  *
  *  1. every INSERT target table name takes the `hive.test.mode.prefix`
  *     prefix (TableSpec's constructor — the write goes to
  *     `tst_dest30`, not `dest30`), and
  *  2. every NON-bucketed base-table scan is sampled by the generated
  *     filter `((hash(rand(460476415)) & Integer.MAX_VALUE) %
  *     hive.test.mode.samplefreq) == 0` (genSamplePredicate with the
  *     hard-coded rand seed at SemanticAnalyzer.java:10228); bucketed
  *     tables instead read only their first bucket.
  *
  * The replay session's `rand` is the reference's per-task
  * java.util.Random sequence (HiveRand) and `hash` is HiveHash, so the
  * sampled row set reproduces the goldens exactly (input30's 18-row
  * sample of src). Partition-pruning equality conjuncts referencing the
  * sampled alias are copied INTO the wrapper ahead of the sample
  * predicate: the reference samples the rows of the PRUNED scan, and
  * Spark only pushes deterministic conjuncts that appear before the
  * first nondeterministic one, so the copied conjuncts reach the scan
  * while the rand filter stays put.
  *
  * Bucketed tables in test mode (first-bucket read) are not needed by
  * the corpus and are left unsampled — loud divergence, not silent:
  * the row counts would differ visibly.
  */
object TestMode {

  private val FromRe =
    ("(?is)\\b(from|join)\\s+`?([A-Za-z_][\\w]*)`?" +
      "(\\s+(?:as\\s+)?(?!(?i:where|group|order|limit|having|union|intersect|" +
      "except|join|on|sort|cluster|distribute|left|right|full|inner|cross|" +
      "outer|lateral|tablesample|select|from|insert|partition)\\b)" +
      "([A-Za-z_][\\w]*))?").r

  private val InsertRe =
    "(?is)\\b(insert\\s+(?:overwrite|into)\\s+table\\s+)`?([\\w]+)`?".r

  def rewrite(spark: SparkSession, stmt: String,
              conf: scala.collection.Map[String, String],
              clustered: Map[String, Seq[String]]): String = {
    if (!conf.get("hive.test.mode").contains("true")) return stmt
    val prefix = conf.getOrElse("hive.test.mode.prefix", "test_")
    val freq = conf.getOrElse("hive.test.mode.samplefreq", "32").trim.toInt
    val noSample = conf.getOrElse("hive.test.mode.nosamplelist", "")
      .split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSet

    // 1. INSERT target prefix (BaseSemanticAnalyzer.java:1010-1015)
    val prefixed = InsertRe.replaceAllIn(stmt, m =>
      Matcher.quoteReplacement(s"${m.group(1)}`$prefix${m.group(2)}`"))

    def partitionCols(t: String): Seq[String] =
      try spark.sessionState.catalog
        .getTableMetadata(TableIdentifier(t)).partitionColumnNames
      catch { case _: Exception => Seq.empty }
    def exists(t: String): Boolean =
      try spark.catalog.tableExists(t) catch { case _: Exception => false }

    // 2. sample every base-table scan
    FromRe.replaceAllIn(prefixed, m => {
      val tbl = m.group(2)
      val lower = tbl.toLowerCase
      if (noSample.contains(lower) || clustered.contains(lower) || !exists(tbl))
        Matcher.quoteReplacement(m.matched)
      else {
        val alias = Option(m.group(4)).getOrElse(tbl)
        // copy `alias.partcol = literal` conjuncts in ahead of the
        // sample so partition pruning happens under the rand filter
        val pruneConjuncts = partitionCols(tbl).flatMap { pc =>
          (s"(?is)\\b$alias\\.$pc\\s*=\\s*('[^']*'|[\\w.]+)").r
            .findFirstMatchIn(stmt).map(mm => s"`$pc` = ${mm.group(1)}")
        }
        val sample =
          s"((hash(rand(460476415)) & 2147483647) % $freq) = 0"
        val whereBody = (pruneConjuncts :+ sample).mkString(" AND ")
        Matcher.quoteReplacement(
          s"${m.group(1)} (SELECT * FROM `$tbl` WHERE $whereBody) $alias")
      }
    })
  }
}
