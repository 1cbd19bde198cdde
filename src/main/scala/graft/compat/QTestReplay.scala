package graft.compat

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Verbatim replay of the reference's own SQL test corpus
  * (ql/src/test/queries/clientpositive + the committed expected outputs
  * in ql/src/test/results/clientpositive) — the engine-migration check a
  * real user runs first: "do MY queries return MY answers?". The
  * committed `.q.out` files both ECHO every executed statement and carry
  * the rows the reference produced for it (itests/util/.../QTestUtil.java
  * drives the originals), so the `.q.out` alone is a self-contained
  * (statement, expected-result) corpus: we re-execute each echoed query
  * through the graft session and require the rendered rows to match.
  *
  * Scope: files whose blocks are ALL read-only (`PREHOOK: type:` QUERY /
  * DESCFUNCTION, no `PREHOOK: Output:`) over the harness's standard
  * fixtures (`src`, `src1`, `srcpart`, `alltypesorc` — q_test_init.sql),
  * i.e. the pure-query half of the corpus. Per-block skips, all
  * engine-presentation surfaces rather than query semantics:
  *   - DESCFUNCTION blocks (help text is the engine's own),
  *   - EXPLAIN / DESCRIBE / SHOW statements (plan + catalog rendering),
  *   - blocks whose echo contains the harness's mask marker (the
  *     original statement text is not recoverable).
  *
  * Comparison: rows rendered in the reference's fetch format (tab
  * separators, `NULL`, Java float/double spellings, JSON-ish complex
  * types — serde2 LazySimpleSerDe's text form) and compared as sorted
  * multisets: the reference's physical emission order for un-ORDERed
  * results is a MapReduce artifact, which is exactly why the reference's
  * own harness sorts under `-- SORT_QUERY_RESULTS`. Multiset equality
  * still pins row count, every value, and every rendering decision.
  */
object QTestReplay {

  /** One PREHOOK..result block of a .q.out file. */
  final case class Block(qtype: String, query: String,
                         inputs: Seq[String], outputs: Seq[String],
                         expected: Seq[String])

  final case class FileResult(file: String, checked: Int, skipped: Int,
                              nondet: Int, failures: Seq[String]) {
    def passed: Boolean = failures.isEmpty && checked > 0
  }

  private val Mask = "#### A masked pattern was here ####"

  /** Parse the PREHOOK/POSTHOOK block structure of a .q.out. */
  def parseQOut(text: String): Seq[Block] = {
    val lines = text.split("\n", -1)
    val out = Seq.newBuilder[Block]
    var i = 0
    val n = lines.length
    while (i < n) {
      if (lines(i).startsWith("PREHOOK: query: ")) {
        val q = new StringBuilder(lines(i).stripPrefix("PREHOOK: query: "))
        i += 1
        while (i < n && !lines(i).startsWith("PREHOOK: type: ")) {
          q.append('\n').append(lines(i)); i += 1
        }
        if (i >= n) return out.result()
        val qtype = lines(i).stripPrefix("PREHOOK: type: ").trim
        i += 1
        val ins = Seq.newBuilder[String]
        val outs = Seq.newBuilder[String]
        while (i < n && (lines(i).startsWith("PREHOOK: ") || lines(i) == Mask)) {
          if (lines(i).startsWith("PREHOOK: Input: ")) ins += lines(i).stripPrefix("PREHOOK: Input: ")
          if (lines(i).startsWith("PREHOOK: Output: ")) outs += lines(i).stripPrefix("PREHOOK: Output: ")
          i += 1
        }
        if (i < n && lines(i).startsWith("POSTHOOK: query: ")) {
          i += 1
          while (i < n && !lines(i).startsWith("POSTHOOK: type: ")) i += 1
          if (i < n) i += 1
          while (i < n && (lines(i).startsWith("POSTHOOK: ") || lines(i) == Mask)) i += 1
        }
        val res = Seq.newBuilder[String]
        var stop = false
        while (i < n && !stop) {
          val l = lines(i)
          // a Warning belongs to the NEXT statement's submission, and the
          // final .q.out line is an artifact of split("\n")
          if (l.startsWith("PREHOOK: query: ") || l.startsWith("Warning: ")) stop = true
          else { res += l; i += 1 }
        }
        // "RUN: Stage-N:..." progress lines and masked-pattern markers
        // are QTestUtil's own noise, interleaved into the committed
        // outputs (local-task logs land mid-results), never result rows
        val r = res.result().filterNot(l => l.startsWith("RUN: Stage-") || l == Mask)
        val trimmed = r.reverse.dropWhile(_.isEmpty).reverse
        out += Block(qtype, q.result(), ins.result(), outs.result(), trimmed)
      } else i += 1
    }
    out.result()
  }

  // ---------------------------------------------------------------- //
  // Fixtures: q_test_init.sql's core tables, built straight from the  //
  // reference's committed data files.                                 //
  // ---------------------------------------------------------------- //

  /** kv*.txt are \u0001-delimited (key, value) STRING pairs; a missing
    * trailing field is NULL (LazySimpleSerDe's missing-column rule),
    * an empty field is the empty string. */
  private def kvTable(spark: SparkSession, file: String): DataFrame = {
    val raw = spark.read.text(file)
    raw.select(
      split(col("value"), "\u0001").getItem(0).as("key"),
      when(size(split(col("value"), "\u0001")) >= 2,
        split(col("value"), "\u0001").getItem(1)).as("value"))
  }

  /** The reference harness's dialect, isolated in a child session (own
    * conf + temp catalog, shared context — nothing leaks to the caller):
    *
    *  - `US/Pacific` session time zone: QTestUtil pins the harness to
    *    Pacific, and every timestamp in the committed outputs renders in
    *    it ([[renderTimestamp]] formats at the same zone).
    *  - `spark.sql.parser.quotedRegexColumnNames`: the corpus sets
    *    `hive.support.quoted.identifiers=none` and selects `` `[k].*` ``
    *    regex columns; Spark ships the same feature behind this conf.
    *  - `hash()` = the reference's ObjectInspectorUtils.hashCode chain.
    *    Spark ships the exact algorithm as catalyst HiveHash (bucketing
    *    interop); the corpus's join tests assert answers through
    *    `sum(hash(...))` fingerprints, so the reference spelling must
    *    resolve to the reference algorithm (Spark's own `hash` is
    *    Murmur3 — every fingerprint would differ).
    */
  def compatSession(spark: SparkSession, refData: String): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.session.timeZone", HarnessZone.getId)
    s.conf.set("spark.sql.parser.quotedRegexColumnNames", "true")
    // the reference formats/parses dates through SimpleDateFormat;
    // Spark's LEGACY parser policy is exactly that behavior
    s.conf.set("spark.sql.legacy.timeParserPolicy", "LEGACY")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hash", es => org.apache.spark.sql.catalyst.expressions.HiveHash(es), "scala_udf")
    // reference-exact mask family, INCLUDING the plain `mask` spelling
    // (Hive's takes up to 9 args and masks numbers/dates; the builtin
    // takes 5 and only strings) — shadowing is right here because this
    // session speaks the reference dialect
    graft.functions.HiveMask.register(s, includePlainMask = true)
    // Hive's interval-construction UDFs are spelled casts in Spark
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "interval_year_month",
      es => org.apache.spark.sql.catalyst.expressions.Cast(es.head, YearMonthIntervalType()),
      "scala_udf")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "interval_day_time",
      es => org.apache.spark.sql.catalyst.expressions.Cast(es.head, DayTimeIntervalType()),
      "scala_udf")
    registerFixtures(s, refData)
    s
  }

  /** Register `src`, `src1`, `srcpart`, `alltypesorc` as session views
    * (idempotent). `refData` is the reference's data/files directory. */
  def registerFixtures(spark: SparkSession, refData: String): Unit = {
    kvTable(spark, s"$refData/kv1.txt").createOrReplaceTempView("src")
    kvTable(spark, s"$refData/kv3.txt").createOrReplaceTempView("src1")
    val one = kvTable(spark, s"$refData/kv1.txt")
    Seq(("2008-04-08", "11"), ("2008-04-08", "12"),
        ("2008-04-09", "11"), ("2008-04-09", "12"))
      .map { case (ds, hr) => one.withColumn("ds", lit(ds)).withColumn("hr", lit(hr)) }
      .reduce(_.unionByName(_))
      .createOrReplaceTempView("srcpart")
    spark.read.orc(s"$refData/alltypesorc").createOrReplaceTempView("alltypesorc")
  }

  // ---------------------------------------------------------------- //
  // Hive fetch-format rendering (serde2 LazySimpleSerDe text form).   //
  // ---------------------------------------------------------------- //

  /** The zone the reference's test harness pinned (QTestUtil). */
  private val HarnessZone = java.time.ZoneId.of("America/Los_Angeles")

  private val TsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss")

  /** TimestampWritable.toString: rendered in the harness zone, whole-
    * second fraction dropped entirely, trailing zeros trimmed otherwise.
    * Formatted at an EXPLICIT zone — java.sql.Timestamp.toString renders
    * in the JVM default zone, which is not the harness's. */
  private def renderTimestamp(ts: java.sql.Timestamp): String = {
    val zdt = ts.toInstant.atZone(HarnessZone)
    val base = zdt.format(TsFmt)
    if (zdt.getNano == 0) base
    else base + "." + f"${zdt.getNano}%09d".reverse.dropWhile(_ == '0').reverse
  }

  /** HiveDecimal values print at their DECLARED scale (cast(key as
    * decimal(10,2)) renders `0.00`) — plain form, no zero-stripping. */
  private def renderDecimal(d: java.math.BigDecimal): String = d.toPlainString

  /** HiveIntervalYearMonth.toString: `y-m`, months normalized to 0-11,
    * one leading sign. */
  private def renderYearMonth(p: java.time.Period): String = {
    val total = p.toTotalMonths
    val sign = if (total < 0) "-" else ""
    s"$sign${math.abs(total) / 12}-${math.abs(total) % 12}"
  }

  /** HiveIntervalDayTime.toString: `d hh:mm:ss.fffffffff` with a fixed
    * 9-digit nano field. */
  private def renderDayTime(dur: java.time.Duration): String = {
    val neg = dur.isNegative
    val d = dur.abs
    val sec = d.getSeconds
    val sign = if (neg) "-" else ""
    f"$sign${sec / 86400}%d ${sec / 3600 % 24}%02d:${sec / 60 % 60}%02d:${sec % 60}%02d.${d.getNano}%09d"
  }

  /** Top-level column rendering: nulls are `NULL`, strings bare. */
  def renderValue(v: Any, dt: DataType): String = v match {
    case null => "NULL"
    case _ => dt match {
      case StringType => v.toString
      case BooleanType | ByteType | ShortType | IntegerType | LongType => v.toString
      case FloatType => java.lang.Float.toString(v.asInstanceOf[Float])
      case DoubleType => java.lang.Double.toString(v.asInstanceOf[Double])
      case _: DecimalType => renderDecimal(v.asInstanceOf[java.math.BigDecimal])
      case TimestampType => renderTimestamp(v.asInstanceOf[java.sql.Timestamp])
      case DateType => v.toString
      case _: YearMonthIntervalType => renderYearMonth(v.asInstanceOf[java.time.Period])
      case _: DayTimeIntervalType => renderDayTime(v.asInstanceOf[java.time.Duration])
      case BinaryType => new String(v.asInstanceOf[Array[Byte]], UTF_8)
      case at: ArrayType =>
        v.asInstanceOf[scala.collection.Seq[Any]]
          .map(renderNested(_, at.elementType)).mkString("[", ",", "]")
      case mt: MapType =>
        v.asInstanceOf[scala.collection.Map[Any, Any]].toSeq
          .map { case (k, mv) =>
            s"${renderNested(k, mt.keyType)}:${renderNested(mv, mt.valueType)}" }
          .mkString("{", ",", "}")
      case st: StructType =>
        // the reference's type system lowercases field names
        val r = v.asInstanceOf[Row]
        st.fields.zipWithIndex
          .map { case (f, idx) =>
            "\"" + f.name.toLowerCase + "\":" + renderNested(r.get(idx), f.dataType) }
          .mkString("{", ",", "}")
      case _ => v.toString
    }
  }

  /** Inside complex types the reference JSON-izes: strings/timestamps/
    * dates quoted, null lowercase, numerics bare. */
  private def renderNested(v: Any, dt: DataType): String = v match {
    case null => "null"
    case _ => dt match {
      case StringType => "\"" + v.toString + "\""
      case TimestampType => "\"" + renderTimestamp(v.asInstanceOf[java.sql.Timestamp]) + "\""
      case DateType => "\"" + v.toString + "\""
      case _ => renderValue(v, dt)
    }
  }

  def renderRow(row: Row, schema: StructType): String =
    schema.fields.zipWithIndex
      .map { case (f, i) => renderValue(row.get(i), f.dataType) }
      .mkString("\t")

  // ---------------------------------------------------------------- //
  // Replay                                                            //
  // ---------------------------------------------------------------- //

  /** First keyword of a statement after leading `--` comments. */
  private def firstWord(q: String): String = {
    val body = q.linesIterator.map(_.trim).filterNot(l => l.isEmpty || l.startsWith("--"))
      .mkString(" ")
    body.split("[\\s(]", 2).headOption.getOrElse("").toLowerCase
  }

  /** Block types / statements replayed vs skipped. Skips are statements
    * whose output is presentation, not query semantics: plans, catalog
    * text, function help. */
  private def skippable(b: Block): Boolean =
    b.qtype != "QUERY" ||
      b.query.contains(Mask) ||
      (firstWord(b.query) match {
        case "explain" | "describe" | "desc" | "show" => true
        case _ => false
      })

  /** LIMIT without ORDER BY: SQL leaves WHICH rows unspecified, so a
    * value mismatch on such a statement is the reference's MapReduce
    * emission order showing through, not a correctness signal — those
    * mismatches are tallied as `nondet`, not failures. (A MATCH is still
    * meaningful — constant projections and limit >= rowcount pin the
    * values regardless of row choice — so these are attempted, not
    * skipped.) */
  private def limitWithoutOrder(q: String): Boolean = {
    val body = q.toLowerCase
    body.contains("limit") && !body.contains("order by")
  }

  /** Replay every checkable block of one .q.out against the session.
    * Failures carry a compact diff head for triage. */
  def replayFile(spark: SparkSession, qoutPath: String): FileResult = {
    val name = Paths.get(qoutPath).getFileName.toString
    val blocks = parseQOut(new String(Files.readAllBytes(Paths.get(qoutPath)), UTF_8))
    var checked = 0
    var skipped = 0
    var nondet = 0
    val failures = Seq.newBuilder[String]
    blocks.foreach { b =>
      if (skippable(b)) skipped += 1
      else {
        try {
          val df = spark.sql(b.query)
          val got = df.collect().map(renderRow(_, df.schema)).toSeq.sorted
          val want = b.expected.sorted
          if (got == want) checked += 1
          else if (limitWithoutOrder(b.query)) nondet += 1
          else {
            checked += 1
            val diff = got.zipAll(want, "<missing>", "<missing>")
              .collectFirst { case (g, w) if g != w => s"got '$g' want '$w'" }
              .getOrElse(s"row count ${got.size} vs ${want.size}")
            failures += s"$name: '${oneLine(b.query)}': $diff"
          }
        } catch {
          case e: Exception =>
            checked += 1
            failures += s"$name: '${oneLine(b.query)}': ${e.getClass.getSimpleName} ${oneLine(Option(e.getMessage).getOrElse(""))}"
        }
      }
    }
    FileResult(name, checked, skipped, nondet, failures.result().take(3))
  }

  private def oneLine(s: String): String = {
    val t = s.replaceAll("\\s+", " ").trim
    if (t.length > 160) t.take(160) + "…" else t
  }

  /** The corpus filter: read-only blocks over the core fixtures only. */
  def selectOnlyOverCoreFixtures(blocks: Seq[Block]): Boolean = {
    val coreInputs = Set("default@src", "default@src1", "default@srcpart",
      "default@alltypesorc", "_dummy_database@_dummy_table",
      "default@srcpart@ds=2008-04-08/hr=11", "default@srcpart@ds=2008-04-08/hr=12",
      "default@srcpart@ds=2008-04-09/hr=11", "default@srcpart@ds=2008-04-09/hr=12")
    blocks.nonEmpty &&
      blocks.forall(b => (b.qtype == "QUERY" || b.qtype == "DESCFUNCTION") &&
        b.outputs.isEmpty && b.inputs.forall(coreInputs)) &&
      blocks.exists(b => b.qtype == "QUERY")
  }
}

/** Corpus discovery: scan EVERY clientpositive .q.out, replay the
  * read-only-over-core-fixtures subset, and print per-file verdicts plus
  * a category summary. Run:
  *   sbt "runMain graft.compat.QTestDiscover [resultsDir] [reportPath]"
  * The committed pass list in ClientPositiveReplaySpec is derived from
  * this report. */
object QTestDiscover {
  def main(args: Array[String]): Unit = {
    val resultsDir = args.headOption
      .getOrElse("/root/reference/ql/src/test/results/clientpositive")
    val report = args.lift(1).getOrElse("/tmp/qtest_report.txt")
    // the reference harness ran with a Pacific SYSTEM zone, and legacy
    // ORC timestamp decoding (alltypesorc) follows the JVM default zone
    // — set it before the context starts. Discovery owns its JVM; the
    // in-suite spec instead pins only zone-independent files (generate
    // that list with QTEST_HARNESS_TZ=none).
    if (!sys.env.get("QTEST_HARNESS_TZ").contains("none"))
      java.util.TimeZone.setDefault(
        java.util.TimeZone.getTimeZone("America/Los_Angeles"))
    val spark = QTestReplay.compatSession(
      graft.Session.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")),
      "/root/reference/data/files")
    val files = Files.list(Paths.get(resultsDir)).iterator().asScala
      .map(_.toString).filter(_.endsWith(".q.out")).toSeq.sorted
    val out = new java.io.PrintWriter(report, "UTF-8")
    var inScope = 0; var pass = 0
    files.foreach { f =>
      val blocks = try QTestReplay.parseQOut(
        new String(Files.readAllBytes(Paths.get(f)), UTF_8)) catch { case _: Exception => Nil }
      if (QTestReplay.selectOnlyOverCoreFixtures(blocks)) {
        val r = QTestReplay.replayFile(spark, f)
        if (r.checked == 0) {
          // nothing binding (presentation-only statements, or un-ORDERed
          // LIMIT row picks) — out of scope, not a pass
          out.println(s"SKIP ${r.file} skipped=${r.skipped} nondet=${r.nondet}")
        } else {
          inScope += 1
          if (r.passed) {
            pass += 1
            out.println(s"PASS ${r.file} checked=${r.checked} skipped=${r.skipped} nondet=${r.nondet}")
          } else {
            out.println(s"FAIL ${r.file} checked=${r.checked} skipped=${r.skipped} nondet=${r.nondet}")
            r.failures.foreach(m => out.println(s"  $m"))
          }
        }
        out.flush()
      }
    }
    out.println(s"== $pass/$inScope in-scope files replay clean ==")
    out.close()
    println(s"[qtest] $pass/$inScope in-scope files replay clean; report at $report")
    spark.stop()
  }
}
