package graft.functions

import java.net.{MalformedURLException, URL}
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `parse_url_tuple(url, part1, ..., partN)` — the reference's tuple
  * UDTF (ql/src/java/org/apache/hadoop/hive/ql/udf/generic/
  * GenericUDTFParseUrlTuple.java:55, registered at
  * FunctionRegistry.java:450), re-expressed as a Catalyst [[Generator]]
  * so the SQL invocation forms work verbatim: `LATERAL VIEW
  * parse_url_tuple(u, 'HOST', ...) b AS ho, ...` and `SELECT
  * parse_url_tuple(u, ...) AS (ho, ...)`.
  *
  * Reference semantics reproduced exactly (same class, process():
  *  - one output row PER input row, always (a tuple UDTF);
  *  - NULL url, or a url java.net.URL rejects (MalformedURLException),
  *    yields a row of all NULLs;
  *  - part names are case-sensitive members of {HOST, PATH, QUERY, REF,
  *    PROTOCOL, FILE, AUTHORITY, USERINFO} or `QUERY:<key>`; anything
  *    else (including NULL) is a NULL column;
  *  - `QUERY:<key>` extracts with the regex `(&|^)key=([^&]*)` over
  *    url.getQuery() (GenericUDTFParseUrlTuple.evaluateQuery:233).
  *
  * Scale: a per-row scalar computation inside the Generate operator —
  * no state, no shuffle; the one-row-out shape keeps Generate's output
  * cardinality equal to its input.
  */
case class ParseUrlTuple(children: Seq[Expression])
    extends Generator with CodegenFallback {

  // the reference rejects fewer than 2 args at analysis time
  // (GenericUDTFParseUrlTuple.initialize: "takes at least two arguments")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.length < 2)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "parse_url_tuple takes at least two arguments: the url and one part name")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def elementSchema: StructType = StructType(
    children.indices.tail.map(i => StructField(s"c${i - 1}", StringType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val n = children.length - 1
    val out = new Array[Any](n)
    val urlV = children.head.eval(input)
    if (urlV != null) {
      val url =
        try new URL(urlV.toString)
        catch { case _: MalformedURLException => null }
      if (url != null) {
        var i = 0
        while (i < n) {
          val pv = children(i + 1).eval(input)
          val r = if (pv == null) null else ParseUrlTuple.extract(url, pv.toString)
          out(i) = if (r == null) null else UTF8String.fromString(r)
          i += 1
        }
      }
    }
    Seq(InternalRow.fromSeq(out.toIndexedSeq))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ParseUrlTuple =
    copy(children = newChildren)
}

object ParseUrlTuple {

  /** The reference's PARTNAME switch (GenericUDTFParseUrlTuple:213). */
  private[functions] def extract(url: URL, part: String): String = part match {
    case "HOST"      => url.getHost
    case "PATH"      => url.getPath
    case "QUERY"     => url.getQuery
    case "REF"       => url.getRef
    case "PROTOCOL"  => url.getProtocol
    case "FILE"      => url.getFile
    case "AUTHORITY" => url.getAuthority
    case "USERINFO"  => url.getUserInfo
    case p if p.startsWith("QUERY:") =>
      val query = url.getQuery
      val key = p.substring(6)
      if (query == null) null
      else {
        // the key is spliced into the regex UNQUOTED, as the reference
        // does (evaluateQuery:234) — regex metacharacters behave there
        // exactly as they do here
        val m = Pattern.compile("(&|^)" + key + "=([^&]*)").matcher(query)
        if (m.find()) m.group(2) else null
      }
    case _ => null // case-sensitive: 'host' is NULLNAME there
  }
}
