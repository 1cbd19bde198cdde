package graft.compat

/** Statement-level HiveQL→Spark-SQL text rewrites for the reference
  * dialect surfaces Spark's grammar/runtime lacks, applied by the
  * corpus replay (and usable by any compat caller) just before
  * `spark.sql`. Every rewrite is a no-op on statements without its
  * construct; untranslatable variants are left untouched so the engine
  * declines loudly rather than silently changing semantics.
  *
  *  - TRANSFORM `USING '<cmd>'`: the reference splits the command itself
  *    on SPACES with quote awareness and execs the argv directly
  *    (ScriptOperator.java splitArgs + ProcessBuilder); Spark hands the
  *    string to `/bin/bash -c`, which re-splits on ALL whitespace — a
  *    TAB argument (`tr '\t' '_'` spelled `USING 'tr \t _'`) silently
  *    loses operands. Reproduce the reference argv by shell-quoting each
  *    splitArgs token.
  *  - TRANSFORM `ROW FORMAT SERDE 'LazySimpleSerDe'` with no
  *    serdeproperties: exactly the default delimited format — dropped
  *    (Spark only accepts the SERDE spelling in hive mode).
  *  - `_UTF-8 0x<hex>` literals (HiveParser charSetStringLiteral) →
  *    plain string literals with the decoded text.
  *  - `CREATE VIEW ... PARTITIONED ON (...)`: partitioned views are
  *    metadata-only in the reference (no effect on SELECT results) —
  *    the clause is stripped.
  *  - `TABLESAMPLE (BUCKET x OUT OF y ON col)`: the reference buckets by
  *    value hash (ObjectInspectorUtils.hashCode & MAX_VALUE) % y —
  *    rewritten to a derived table with that exact filter (`hash` in the
  *    compat session IS the reference chain, catalyst HiveHash).
  *  - RANGE frame without ORDER BY: every partition row is a peer, so
  *    CURRENT ROW/UNBOUNDED bounds span the whole partition
  *    (WindowingSpec.java frame defaulting) — rewritten to the
  *    equivalent ROWS UNBOUNDED/UNBOUNDED frame Spark accepts.
  *  - `FROM UNIQUEJOIN [PRESERVE] T a (keys), ... SELECT ...`
  *    (HiveParser uniqueJoinToken): per CommonJoinOperator
  *    .checkAndGenObject, a key group is emitted iff every table has the
  *    key OR some PRESERVE table has it — rewritten to a chained FULL
  *    OUTER JOIN with presence flags and that emit predicate.
  *  - `FROM noop(ON t [PARTITION BY..][ORDER BY..]) ...`: the noop PTF
  *    forwards rows unchanged — the table reference replaces it.
  */
object HiveRewrites {

  def apply(stmt: String): String = apply(stmt, transformUnescape = false)

  def apply(stmt: String, transformUnescape: Boolean): String =
    apply(stmt, transformUnescape, "HIVE_SCRIPT_OPERATOR_ID")

  def apply(stmt: String, transformUnescape: Boolean,
            scriptIdVar: String): String =
    apply(stmt, transformUnescape, scriptIdVar, partialScriptOk = false)

  def apply(stmt: String, transformUnescape: Boolean,
            scriptIdVar: String, partialScriptOk: Boolean): String = {
    var s = stmt
    if (upper(s).contains("_UTF-8 0X")) s = utf8HexLiteral(s)
    if (upper(s).contains("GROUPING__ID")) s = hiveGroupingId(s)
    if (upper(s).contains("OVER")) s = orderlessRanking(s)
    if (upper(s).startsWith("WITH") || "(?is)^\\s*with\\b".r.findFirstIn(s).isDefined)
      s = cteReorder(s)
    if (!upper(s).contains("TRANSFORM") && upper(s).contains("USING"))
      s = mapReduceToTransform(s)
    if (upper(s).contains("TRANSFORM")) {
      s = usingSingleQuotes(s)
      s = stripLazySerde(s)
      if (transformUnescape) s = transformUnescapeWrap(s)
      val t = transformTabFormat(s, scriptIdVar, partialScriptOk)
      // the tab-format rewrite re-spells the command itself; only fall
      // back to the argv-only fix for the shapes it declined
      s = if (t == s) shellQuoteUsing(s) else t
    }
    if (upper(s).contains("OVER") && upper(s).contains("GROUP"))
      s = windowAliasSubst(s)
    if (upper(s).contains("GROUPING") && upper(s).contains("SETS"))
      s = duplicateGroupingSets(s)
    if (upper(s).contains("PARTITIONED ON")) s = viewPartitionedOn(s)
    if (upper(s).contains("TABLESAMPLE")) s = bucketSampleOn(s)
    if (upper(s).contains("RANGE")) s = rangeFrameNoOrder(s)
    if (upper(s).contains("UNIQUEJOIN")) s = uniqueJoin(s)
    if (upper(s).contains("NOOP")) s = noopPtf(s)
    if (upper(s).contains("DEFAULT.")) s = stripDefaultDb(s)
    // HiveParser puts = and IN at the SAME precedence, left-associative:
    // `1 = 1 IN (true, false)` parses as `(1 = 1) IN (...)`; Spark's
    // grammar rejects the chain outright, so parenthesize it
    if (upper(s).contains(" IN"))
      s = s.replaceAll(
        "(?i)(?<![<>!=])\\b([\\w.'\\\"]+)\\s*=\\s*([\\w.'\\\"]+)\\s+IN\\s*\\(",
        "($1 = $2) IN (")
        .replaceAll(
          "(?i)\\b([\\w.'\\\"]+)\\s+IN\\s*(\\([^()]*\\))\\s*=\\s*([\\w.'\\\"]+)",
          "($1 IN $2) = $3")
    // the INPUT__FILE__NAME virtual column IS Spark's input_file_name()
    // — spelled through the compat session's deterministic wrapper so
    // aggregate arguments accept it (bucket5's COUNT(DISTINCT ...));
    // unqualified uses only (a join-side qualifier has no analog), and
    // BACKTICKED spellings are the __vc fixture COLUMN and stay put
    if (upper(s).contains("INPUT__FILE__NAME"))
      s = s.replaceAll("(?i)(?<![\\w.`])INPUT__FILE__NAME\\b(?!`)", "graft_input_file()")
    if (upper(s).contains("CAST") &&
        (upper(s).contains("CHAR") || upper(s).contains("VARCHAR")))
      s = charCastTruncate(s)
    if (upper(s).contains("STRUCT")) s = hiveStructCalls(s)
    if (upper(s).contains("DIRECTORY")) {
      // normalize double-quoted directory paths onto the single-quoted
      // shape the rewrite anchors on (root_dir_external_table)
      s = "(?is)\\b(directory)\\s+\"([^\"]+)\"".r
        .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
          s"${m.group(1)} '${m.group(2)}'"))
      s = overwriteDirectory(s)
    }
    s = hiveNumericLiterals(s)
    s
  }

  /** Re-root a DIRECTORY-insert target onto the replay scratch: paths
    * already under the scratch stay; bare /tmp/... paths split by
    * FILESYSTEM — LOCAL inserts land under localroot (where tmpReroot
    * sends `file:///tmp/...`), schemeless non-local ones are HDFS paths
    * and land under hdfsroot (where `hdfs:///...` lands) — the
    * two-filesystem tests (schemeAuthority) hinge on the separation;
    * anything else (paths into the read-only reference tree) re-roots
    * onto a flat dirs/ area. */
  private[compat] def rerootDirectory(raw: String, local: Boolean): String = {
    val tmpBase = System.getProperty("java.io.tmpdir") + "/qtest_tmp"
    val p = raw.stripPrefix("file:")
    if (p.startsWith(tmpBase)) p
    else if (p.startsWith("/tmp/"))
      tmpBase + (if (local) "/localroot" else "/hdfsroot") + p
    else tmpBase + "/dirs/" + new java.io.File(p).getName
  }

  /** `INSERT OVERWRITE [LOCAL] DIRECTORY 'p' [row format|stored as ...]
    * SELECT ...`: Spark's native form needs `USING <source>`; the
    * corpus's directory paths re-root per [[rerootDirectory]] and write
    * TEXT through the csv mapping (later statements cat or LOAD the
    * produced files back). */
  private[compat] def overwriteDirectory(stmt: String): String = {
    val Re = ("(?is)^\\s*insert\\s+overwrite\\s+(local\\s+)?directory\\s+'([^']+)'" +
      "\\s*((?:row\\s+format\\b.*?)??)\\s*(?:stored\\s+as\\s+\\w+)?\\s*((?:select\\b|with\\b(?!\\s+serdeproperties)).*)$").r
    Re.findFirstMatchIn(stmt) match {
      case Some(m) =>
        val local = m.group(1) != null
        val path = rerootDirectory(m.group(2), local)
        // directory inserts write TEXT (LazySimpleSerDe defaults or the
        // declared DELIMITED layout) -- later statements cat or LOAD the
        // produced files back
        val rf = m.group(3)
        def prop(key: String): Option[String] =
          ("'" + key + "'\\s*=\\s*'([^']*)'").r.findFirstMatchIn(rf)
            .map(x => unescapeSqlBody(x.group(1)))
        val sep = "(?is)fields\\s+terminated\\s+by\\s+'([^']*)'".r
          .findFirstMatchIn(rf).map(x => unescapeSqlBody(x.group(1)))
          .orElse(prop("field.delim")).getOrElse("\u0001")
        val nullRep = "(?is)null\\s+defined\\s+as\\s+'([^']*)'".r
          .findFirstMatchIn(rf).map(x => unescapeSqlBody(x.group(1)))
          .orElse(prop("serialization.null.format")).getOrElse("\\N")
        val using = s"USING csv OPTIONS (sep '${escapeSqlBody(sep)}', quote '\\u0000', " +
          s"nullValue '${escapeSqlBody(nullRep)}', emptyValue '')"
        s"INSERT OVERWRITE DIRECTORY '$path' $using ${m.group(4)}"
      case None =>
        // FROM-first multi-insert: rewrite each embedded directory
        // target in place (a conservative DELIMITED-clause matcher so
        // the following SELECT stays untouched)
        val Inline = ("(?is)insert\\s+overwrite\\s+(local\\s+)?directory\\s+'([^']+)'" +
          "\\s*((?:row\\s+format\\s+delimited" +
          "(?:\\s+fields\\s+terminated\\s+by\\s+'[^']*')?" +
          "(?:\\s+collection\\s+items\\s+terminated\\s+by\\s+'[^']*')?" +
          "(?:\\s+map\\s+keys\\s+terminated\\s+by\\s+'[^']*')?" +
          "(?:\\s+lines\\s+terminated\\s+by\\s+'[^']*')?" +
          "(?:\\s+null\\s+defined\\s+as\\s+'[^']*')?)?)").r
        if ("(?is)^\\s*from\\b".r.findFirstIn(stmt).isEmpty) stmt
        else Inline.replaceAllIn(stmt, m2 => {
          val path = rerootDirectory(m2.group(2), m2.group(1) != null)
          val rf = Option(m2.group(3)).getOrElse("")
          def prop(key: String): Option[String] =
            ("'" + key + "'\\s*=\\s*'([^']*)'").r.findFirstMatchIn(rf)
              .map(x => unescapeSqlBody(x.group(1)))
          val sep = "(?is)fields\\s+terminated\\s+by\\s+'([^']*)'".r
            .findFirstMatchIn(rf).map(x => unescapeSqlBody(x.group(1)))
            .orElse(prop("field.delim")).getOrElse("")
          val nullRep = "(?is)null\\s+defined\\s+as\\s+'([^']*)'".r
            .findFirstMatchIn(rf).map(x => unescapeSqlBody(x.group(1)))
            .orElse(prop("serialization.null.format")).getOrElse("\\N")
          java.util.regex.Matcher.quoteReplacement(
            s"INSERT OVERWRITE DIRECTORY '$path' USING csv OPTIONS (" +
              s"sep '${escapeSqlBody(sep)}', quote '\\u0000', " +
              s"nullValue '${escapeSqlBody(nullRep)}', emptyValue '')")
        })
    }
  }

  /** The directory a rewritten INSERT OVERWRITE DIRECTORY lands in. */
  private[compat] def directoryTarget(stmt: String): Option[String] =
    "(?is)^\\s*insert\\s+overwrite\\s+(local\\s+)?directory\\s+'([^']+)'".r
      .findFirstMatchIn(stmt)
      .map(m => rerootDirectory(m.group(2), m.group(1) != null))

  /** The reference's `struct(...)` names its fields col1..colN
    * (GenericUDFStruct); Spark's grammar builds the constructor before
    * any registry lookup can shadow it, so the CALL spelling is
    * re-pointed at the compat session's `hive_struct`. `STRUCT<...>`
    * type syntax and named_struct are untouched. */
  private def hiveStructCalls(stmt: String): String =
    "(?i)\\bstruct\\s*\\(".r.replaceAllIn(stmt, "hive_struct(")

  /** The corpus lives in `default`; the replay session keeps it in its
    * own database — strip the qualifier so `default.t` resolves to the
    * session's `t` (same object, different namespace). */
  private def stripDefaultDb(stmt: String): String =
    "(?i)\\bdefault\\.(?=[\\w`])".r.replaceAllIn(stmt, "")

  private def upper(s: String) = s.toUpperCase(java.util.Locale.ROOT)

  // ------------------------------------------------------------------ //
  // shared literal machinery                                            //
  // ------------------------------------------------------------------ //

  /** The reference's unescapeSQLString (BaseSemanticAnalyzer.java) over a
    * literal BODY (enclosing quotes already removed). */
  private[compat] def unescapeSqlBody(b: String): String = {
    val sb = new StringBuilder(b.length)
    var i = 0
    while (i < b.length) {
      val c = b.charAt(i)
      if (c == '\\' && i + 5 < b.length && b.charAt(i + 1) == 'u' &&
          (2 to 5).forall(j => Character.digit(b.charAt(i + j), 16) >= 0)) {
        val code = (2 to 5).foldLeft(0)((a, j) => (a << 4) + Character.digit(b.charAt(i + j), 16))
        sb.append(code.toChar); i += 6
      } else if (c == '\\' && i + 3 < b.length &&
          b.charAt(i + 1) >= '0' && b.charAt(i + 1) <= '1' &&
          b.charAt(i + 2) >= '0' && b.charAt(i + 2) <= '7' &&
          b.charAt(i + 3) >= '0' && b.charAt(i + 3) <= '7') {
        val v = (b.charAt(i + 1) - '0') * 64 + (b.charAt(i + 2) - '0') * 8 + (b.charAt(i + 3) - '0')
        sb.append(v.toChar); i += 4
      } else if (c == '\\' && i + 1 < b.length) {
        b.charAt(i + 1) match {
          case '0' => sb.append('\u0000')
          case '\'' => sb.append('\'')
          case '"' => sb.append('"')
          case 'b' => sb.append('\b')
          case 'n' => sb.append('\n')
          case 'r' => sb.append('\r')
          case 't' => sb.append('\t')
          case 'Z' => sb.append('\u001A')
          case '\\' => sb.append('\\')
          case '%' => sb.append("\\%")
          case '_' => sb.append("\\_")
          case n => sb.append(n)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Escape arbitrary text back into a Spark single-quoted literal body. */
  private[compat] def escapeSqlBody(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '\'' => "\\'"
      case '\t' => "\\t"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** The reference's ScriptOperator.splitArgs: split on SPACES (only)
    * outside single/double quotes; quotes delimit tokens and are
    * stripped. */
  private[graft] def splitArgs(args: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var state = 0 // 0 outside, 1 single, 2 double
    var argstart = 0
    var c = 0
    while (c <= args.length) {
      val last = c == args.length
      var endToken = false
      if (!last) {
        args.charAt(c) match {
          case '\'' if state == 0 => state = 1; endToken = true
          case '\'' if state == 1 => state = 0; endToken = true
          case '"' if state == 0 => state = 2; endToken = true
          case '"' if state == 2 => state = 0; endToken = true
          case ' ' if state == 0 => endToken = true
          case _ =>
        }
      }
      if (last || endToken) {
        if (c != argstart) out += args.substring(argstart, c)
        argstart = c + 1
      }
      c += 1
    }
    out.result()
  }

  private def shellQuote(arg: String): String =
    "'" + arg.replace("'", "'\\''") + "'"

  // ------------------------------------------------------------------ //
  // individual rewrites                                                 //
  // ------------------------------------------------------------------ //

  private val UsingRe = "(?is)\\busing\\s+'((?:[^'\\\\]|\\\\.)*)'".r

  private val UsingDq = "(?is)\\busing\\s+\"((?:[^\"\\\\]|\\\\.)*)\"".r

  /** `USING "cmd"` → `USING 'cmd'` so the argv rewrites (which anchor
    * on the single-quoted form) see it; the body's escaped double
    * quotes relax and bare single quotes re-escape. */
  /** `hive.transform.escape.input=true`: the reference's
    * TextRecordReader runs HiveUtils.unescapeText over each OUTPUT
    * field -- `\\`->`\`, `\n`/`\r`/`\t` -> the real bytes -- observed
    * per FIELD (an unescaped tab stays INSIDE its column;
    * remote_script/newline goldens). Reproduced by wrapping the
    * TRANSFORM in a projection that unescapes every output column. */
  private[compat] def transformUnescapeWrap(stmt: String): String = {
    val SelT = "(?is)\\bselect\\s+transform\\s*\\(".r
    val m = SelT.findFirstMatchIn(stmt).getOrElse(return stmt)
    val usingM = UsingRe.findFirstMatchIn(stmt.substring(m.start))
      .getOrElse(return stmt)
    val tail = stmt.substring(m.start + usingM.end)
    val AsParenNames = "(?is)^\\s+as\\s*\\(([^)]*)\\)".r
    val AsNames = ("(?is)^\\s+as\\s+(`?\\w+`?(?:\\s+\\w+(?:\\([\\d,\\s]*\\))?)?" +
      "(?:\\s*,\\s*`?\\w+`?(?:\\s+\\w+(?:\\([\\d,\\s]*\\))?)?)*)").r
    val rawNames = AsParenNames.findFirstMatchIn(tail).map(_.group(1))
      .orElse(AsNames.findFirstMatchIn(tail).map(_.group(1)))
      .getOrElse(return stmt)
    val names = rawNames.split(",").map(_.trim.split("\\s+").head.replace("`", ""))
    def unesc(c: String): String =
      s"replace(replace(replace(replace(replace($c, '\\\\\\\\', char(7)), " +
        s"'\\\\n', char(10)), '\\\\r', char(13)), '\\\\t', char(9)), " +
        "char(7), '\\\\')"
    val proj = names.map(n => s"${unesc(n)} AS $n").mkString(", ")
    val prefix = stmt.substring(0, m.start)
    // the INPUT side escapes symmetrically (TextRecordWriter under the
    // same conf): real \ tab LF CR in a field reach the script as the
    // two-character escapes, so embedded separators survive round trips
    val openIdx = stmt.indexOf('(', m.start)
    val closeIdx = HiveDdl.matchParen(stmt, openIdx)
    def esc(c: String): String =
      s"replace(replace(replace(replace($c, '\\\\', '\\\\\\\\'), " +
        "char(9), '\\\\t'), char(10), '\\\\n'), char(13), '\\\\r')"
    val args = splitTop(stmt.substring(openIdx + 1, closeIdx))
      .map(a => esc(a.trim)).mkString(", ")
    val inner = (stmt.substring(m.start, openIdx + 1) + args +
      stmt.substring(closeIdx)).trim.stripSuffix(";")
    s"$prefix SELECT $proj FROM ( $inner ) __transform_unesc"
  }

  private[compat] def usingSingleQuotes(stmt: String): String =
    UsingDq.replaceAllIn(stmt, m => java.util.regex.Matcher.quoteReplacement(
      "USING '" + m.group(1).replace("\\\"", "\"").replace("'", "\\'") + "'"))

  /** `USING '<cmd>'` → the command re-spelled so bash -c reproduces the
    * reference's argv. Skips commands that already split identically
    * under bash's simple whitespace rules (no tabs/quotes). */
  private[compat] def shellQuoteUsing(stmt: String): String =
    UsingRe.replaceAllIn(stmt, m => {
      val cmd = unescapeSqlBody(m.group(1))
      val argv = splitArgs(cmd)
      val needsQuoting =
        cmd.exists(ch => ch == '\t' || ch == '\n' || ch == '\'' || ch == '"')
      if (!needsQuoting || argv.isEmpty) m.matched
      else java.util.regex.Matcher.quoteReplacement(
        "USING '" + escapeSqlBody(argv.map(shellQuote).mkString(" ")) + "'")
    })

  /** The reference pipes TRANSFORM data TAB-separated in both directions
    * (ScriptOperator's LazySimpleSerDe defaults); Spark's non-hive
    * script transform defaults to U+0001 — invisible to pass-through
    * scripts like `cat` but wrong for any script that interprets its
    * input (`tr '\t' '_'` sees no tabs). Inject explicit TAB row formats
    * around every `TRANSFORM(...) USING` whose formats are defaulted;
    * statements with their own ROW FORMAT (or MAP/REDUCE spellings whose
    * input list has no closing paren to anchor on) pass through. */
  private[compat] val scriptOpIds = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Hive's `MAP exprs USING 'cmd'` / `REDUCE exprs USING 'cmd'`
    * spellings are pure synonyms of `SELECT TRANSFORM(exprs) USING`
    * (the reference's grammar routes all three to the same
    * ScriptOperator) — normalize them so [[transformTabFormat]]'s
    * `) USING` anchor applies and the script sees the reference's
    * TAB-delimited lanes instead of Spark's U+0001 no-serde default
    * (input20's reduce script interprets its input; under U+0001 it
    * sees no tabs and its own output splits wrong). Only fires when the
    * statement has a quoted USING command and no TRANSFORM spelling
    * already. */
  private[compat] def mapReduceToTransform(stmt: String): String = {
    if ("(?is)\\busing\\s+'".r.findFirstIn(stmt).isEmpty ||
        "(?is)\\btransform\\b".r.findFirstIn(stmt).isDefined) return stmt
    ("(?is)\\b(?:map|reduce)\\s+(?!\\()" +
      "((?:(?!\\b(?:using|select|insert|map|reduce)\\b).)+?)\\s+using(\\s+')").r
      .replaceAllIn(stmt, m =>
        java.util.regex.Matcher.quoteReplacement(
          s"SELECT TRANSFORM(${m.group(1).trim}) USING${m.group(2)}"))
  }

  private[compat] def transformTabFormat(stmt: String,
      scriptIdVar: String = "HIVE_SCRIPT_OPERATOR_ID",
      partialScriptOk: Boolean = false): String = {
    if ("(?is)\\btransform\\s*\\(".r.findFirstIn(stmt).isEmpty) return stmt
    val usings = UsingRe.findAllMatchIn(stmt).toList
    if (usings.isEmpty) return stmt
    // only rewrite when EVERY using is anchored `) USING` (defaulted
    // input format) — mixing rewritten and native delimiters in one
    // statement would desync the lanes
    if (!usings.forall(m => stmt.substring(0, m.start).trim.endsWith(")"))) return stmt
    val Fmt = " ROW FORMAT DELIMITED FIELDS TERMINATED BY '\\t'"
    val AsParen = "(?is)^\\s+as\\s*\\(".r
    val Types = "(?:string|int|integer|bigint|smallint|tinyint|float|double|" +
      "boolean|binary|decimal|date|timestamp|varchar|char)"
    val AsList = ("(?is)^\\s+as\\s+`?\\w+`?(\\s+" + Types +
      "(\\([\\d,\\s]*\\))?)?(\\s*,\\s*`?\\w+`?(\\s+" + Types +
      "(\\([\\d,\\s]*\\))?)?)*").r
    val RowFmt = "(?is)^\\s*row\\s+format\\b".r
    val sb = new StringBuilder
    var last = 0
    usings.foreach { m =>
      var p = m.end
      val tail = stmt.substring(p)
      val asClause: Option[String] = AsParen.findFirstMatchIn(tail) match {
        case Some(ap) =>
          val close = HiveDdl.matchParen(stmt, p + ap.end - 1)
          if (close > 0) { val c = stmt.substring(p, close + 1); p = close + 1; Some(c) }
          else None
        case None =>
          AsList.findFirstMatchIn(tail).map { al =>
            val c = stmt.substring(p, p + al.end); p = p + al.end
            // Spark's grammar wants typed output lists parenthesized
            val AsHead = "(?is)^(\\s+as\\s+)(.*)$".r
            AsHead.findFirstMatchIn(c)
              .map(m2 => s"${m2.group(1)}(${m2.group(2)})").getOrElse(c)
          }
      }
      // the reference execs splitArgs(cmd) directly (no shell) — quote
      // each token so bash -c reproduces that argv; with NO output list
      // the default (key, value) schema gives `value` the REST OF THE
      // LINE (PlanUtils lastColumnTakesRestOfTheLine) — reproduced by
      // marking only the FIRST tab (\x02 never occurs in the corpus
      // data) and splitting on the mark
      val argv = splitArgs(unescapeSqlBody(m.group(1)))
      val restOfLine = asClause.isEmpty
      val cmd0 = argv.map(shellQuote).mkString(" ")
      // each script operator instance gets a UNIQUE id in its
      // environment (ScriptOperator's HIVE_SCRIPT_OPERATOR_ID, name
      // overridable via hive.script.operator.id.env.var)
      val opId = scriptOpIds.incrementAndGet()
      val envPrefix = s"export $scriptIdVar=$opId; "
      // hive.exec.script.allow.partial.consumption=true: the reference
      // tolerates a script that stops reading its input early
      // (ScriptOperator's broken-pipe path under the conf;
      // script_pipe's `head -n 1`); draining the remaining stdin after
      // the script exits makes that deterministic here
      val drain = if (partialScriptOk) "; cat > /dev/null 2>/dev/null" else ""
      val cmd =
        if (restOfLine && drain.isEmpty)
          "set -o pipefail; " + envPrefix + cmd0 + " | sed -e 's/\\t/\\x02/'"
        else if (restOfLine) // group so the drain's exit, not the pipe, ends the stage
          "set -o pipefail; " + envPrefix + "{ " + cmd0 + drain + " ; } | sed -e 's/\\t/\\x02/'"
        else envPrefix + cmd0 + drain
      val outFmt =
        if (restOfLine) " ROW FORMAT DELIMITED FIELDS TERMINATED BY '\\u0002'"
        else Fmt
      sb.append(stmt.substring(last, m.start)).append(Fmt)
        .append(" USING '").append(escapeSqlBody(cmd)).append("' ")
        .append(asClause.getOrElse(""))
      if (RowFmt.findFirstIn(stmt.substring(p)).isEmpty) sb.append(outFmt)
      last = p
    }
    sb.append(stmt.substring(last))
    sb.toString
  }

  /** Plain LazySimpleSerDe TRANSFORM serde = the default row format. */
  private[compat] def stripLazySerde(stmt: String): String = {
    val bare = ("(?is)row\\s+format\\s+serde\\s+'org\\.apache\\.hadoop\\.hive\\.serde2\\." +
      "lazy\\.LazySimpleSerDe'(?!\\s*with)").r.replaceAllIn(stmt, " ")
    // the serde spelled WITH ('serialization.last.column.takes.rest'=
    // 'true') [RECORDREADER 'BinaryRecordReader']: the single/last
    // output column absorbs the whole line, separators included
    // (binary_output_format's mydata carries the TAB) — a delimiter
    // that never occurs in text keeps the line whole; the binary
    // record reader round-trips through newline-split rows either way
    ("(?is)row\\s+format\\s+serde\\s+'org\\.apache\\.hadoop\\.hive\\.serde2\\." +
      "lazy\\.LazySimpleSerDe'\\s+with\\s+serdeproperties\\s*\\(\\s*" +
      "'serialization\\.last\\.column\\.takes\\.rest'\\s*=\\s*'true'\\s*\\)" +
      "(\\s+recordreader\\s+'[^']*')?").r
      .replaceAllIn(bare, " ROW FORMAT DELIMITED FIELDS TERMINATED BY '\\\\u0000' ")
  }

  /** `_UTF-8 0x<hex>` / `_<charset> 0x...` string literal. */
  private[compat] def utf8HexLiteral(stmt: String): String =
    "(?i)_UTF-8\\s+0x([0-9A-Fa-f]+)".r.replaceAllIn(stmt, m => {
      val hex = m.group(1)
      val bytes = hex.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
      java.util.regex.Matcher.quoteReplacement(
        "'" + escapeSqlBody(new String(bytes, java.nio.charset.StandardCharsets.UTF_8)) + "'")
    })

  /** Strip PARTITIONED ON from CREATE VIEW. */
  private[compat] def viewPartitionedOn(stmt: String): String =
    if ("(?is)^\\s*create\\s+view\\b".r.findFirstIn(stmt).isEmpty) stmt
    else "(?is)\\s+partitioned\\s+on\\s*\\([^)]*\\)".r.replaceFirstIn(stmt, " ")

  /** `t TABLESAMPLE (BUCKET x OUT OF y ON cols) [alias]` → derived table
    * with the reference's value-bucketing filter. */
  private[compat] def bucketSampleOn(stmt: String): String = {
    val Re = ("(?is)([\\w.`]+)\\s+tablesample\\s*\\(\\s*bucket\\s+(\\d+)\\s+out\\s+of\\s+" +
      "(\\d+)\\s+on\\s+([^)]+)\\)(\\s+(?:as\\s+)?(?!(?i:where|group|order|limit|having|union|intersect|except|join|on|sort|cluster|distribute|left|right|full|inner|cross|lateral|tablesample|select|from)\\b)(\\w+))?").r
    Re.replaceAllIn(stmt, m => {
      val (tbl, x, y, cols) = (m.group(1), m.group(2), m.group(3), m.group(4).trim)
      val alias = Option(m.group(6)).getOrElse(tbl.replace("`", "").split("\\.").last)
      java.util.regex.Matcher.quoteReplacement(
        s"(SELECT * FROM $tbl WHERE (hash($cols) & 2147483647) % $y = ${x.toInt - 1}) $alias")
    })
  }

  /** `hive.outerjoin.supports.filters=false` (the legacy pre-filterTag
    * mode some corpus files SET): single-side ON predicates of OUTER
    * joins apply to the JOIN INPUTS, not as match conditions — a row
    * failing its own side's filter is gone entirely, never null-
    * extended. Reproduce by moving every single-alias conjunct of each
    * ON into a filtered derived table for that alias; cross-side
    * conjuncts stay in the ON (an emptied ON becomes `1=1`, Hive's
    * cross product). */
  private[compat] def outerJoinFilterPush(stmt: String): String = {
    if ("(?is)\\b(left|right|full)\\s+outer\\s+join\\b".r.findFirstIn(stmt).isEmpty)
      return stmt
    val endKeywords = Seq("JOIN", "LEFT", "RIGHT", "FULL", "INNER", "CROSS",
      "WHERE", "GROUP", "ORDER", "SORT", "CLUSTER", "DISTRIBUTE", "LIMIT",
      "UNION", "HAVING")
    def tokenFrom(s: String, word: String, from: Int): Int = {
      val i = tokenAtDepth0(s.substring(from), word)
      if (i < 0) -1 else from + i
    }
    // ON extents
    final case class Span(start: Int, end: Int, repl: String)
    val spans = Seq.newBuilder[Span]
    val pure = scala.collection.mutable.Map.empty[String, Vector[String]]
    var from = 0
    var found = false
    while ({ val p = tokenFrom(stmt, "ON", from); p >= 0 && {
      val exprStart = p + 2
      val ends = endKeywords.map(k => tokenFrom(stmt, k, exprStart)).filter(_ >= 0)
      val exprEnd = if (ends.isEmpty) stmt.length else ends.min
      var expr = stmt.substring(exprStart, exprEnd).trim.stripSuffix(";").trim
      // unwrap a fully-parenthesizing outer paren (possibly repeated)
      var unwrapped = true
      while (unwrapped && expr.startsWith("(") &&
          HiveDdl.matchParen(expr, 0) == expr.length - 1)
        { val inner = expr.substring(1, expr.length - 1).trim
          if (inner.isEmpty) unwrapped = false else expr = inner }
      val conjuncts = splitTopAnd(expr)
      // alias qualifiers only: a leading digit/dot means a decimal
      // literal's fraction point (`a.x > 1.5` qualifies only `a`)
      val AliasRef = "(?<![\\w.])([A-Za-z_]\\w*)\\s*\\.".r
      val (single, cross) = conjuncts.partition { c =>
        AliasRef.findAllMatchIn(c).map(_.group(1)).toSet.size == 1
      }
      if (single.nonEmpty) {
        found = true
        single.foreach { c =>
          val a = AliasRef.findFirstMatchIn(c).get.group(1)
          pure(a) = pure.getOrElse(a, Vector.empty) :+ c
        }
        val kept = if (cross.isEmpty) "1=1" else cross.mkString(" AND ")
        spans += Span(exprStart, exprEnd, s" $kept ")
      }
      from = exprEnd
      true
    } }) ()
    if (!found) return stmt
    // table refs: FROM/JOIN <table> <alias>. Two-phase: every pushed
    // alias must resolve to a replaceable plain-table ref FIRST — an
    // alias this scan cannot locate (unaliased table, backticked name,
    // derived-table input) would otherwise lose its predicate entirely
    // when the ON above was already emptied.
    val stop = Set("where", "on", "select", "left", "right", "full", "inner",
      "cross", "join", "lateral", "tablesample", "group", "order", "sort",
      "cluster", "distribute", "limit", "union", "having")
    val aliasSpans = Seq.newBuilder[Span]
    val located = scala.collection.mutable.Set.empty[String]
    "(?is)\\b(from|join)\\s+([\\w.]+)\\s+(\\w+)".r.findAllMatchIn(stmt).foreach { m =>
      val alias = m.group(3)
      if (!stop(alias.toLowerCase)) pure.get(alias).foreach { conjs =>
        located += alias
        aliasSpans += Span(m.start(2), m.end(3),
          s"(SELECT * FROM ${m.group(2)} $alias WHERE ${conjs.mkString(" AND ")}) $alias")
      }
    }
    if (!pure.keysIterator.forall(located)) return stmt
    spans ++= aliasSpans.result()
    val ordered = spans.result().sortBy(_.start)
    val sb = new StringBuilder
    var last = 0
    ordered.foreach { s =>
      sb.append(stmt.substring(last, s.start)).append(s.repl); last = s.end
    }
    sb.append(stmt.substring(last))
    sb.toString
  }

  /** HiveQL resolves SELECT-list ALIASES inside window specs — `max(c)
    * comments ... rank() OVER (ORDER BY comments)` orders by the
    * aggregate (groupby_grouping_window); Spark resolves the raw column
    * and rejects it as non-aggregating. Substitute aggregate aliases
    * into OVER bodies. */
  private[compat] def windowAliasSubst(stmt: String): String = {
    val AggAlias = ("(?i)\\b((?:max|min|sum|avg|count)\\s*\\([^()]*\\))" +
      "\\s+(?:as\\s+)?([A-Za-z_]\\w*)").r
    val stop = Set("over", "from", "as", "where", "group", "order", "limit",
      "having", "union", "on", "join", "and", "or", "then", "else", "end",
      "when", "in", "is", "not", "like", "desc", "asc")
    val aliases = AggAlias.findAllMatchIn(stmt)
      .map(m => m.group(2) -> m.group(1)).toList
      .filterNot { case (a, _) => stop(a.toLowerCase) }
    if (aliases.isEmpty) return stmt
    val sb = new StringBuilder
    var last = 0
    "(?i)\\bover\\s*\\(".r.findAllMatchIn(stmt).foreach { m =>
      val open = m.end - 1
      val close = HiveDdl.matchParen(stmt, open)
      if (close > 0 && m.start >= last) {
        var body = stmt.substring(open + 1, close)
        aliases.foreach { case (a, expr) =>
          body = body.replaceAll(
            "(?i)(?<![.\\w])" + java.util.regex.Pattern.quote(a) + "\\b",
            java.util.regex.Matcher.quoteReplacement(expr))
        }
        sb.append(stmt.substring(last, open + 1)).append(body)
        last = close
      }
    }
    sb.append(stmt.substring(last))
    sb.toString
  }

  /** Split on depth-0 AND tokens. */
  private def splitTopAnd(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var from = 0
    var cont = true
    while (cont) {
      val i = tokenAtDepth0(s.substring(from), "AND")
      if (i < 0) { out += s.substring(from).trim; cont = false }
      else { out += s.substring(from, from + i).trim; from = from + i + 3 }
    }
    out.result().filter(_.nonEmpty)
  }

  /** `CAST(e AS CHAR(n)|VARCHAR(n))` truncates to n in the reference
    * (HiveBaseChar.enforceMaxLength — GenericUDFToChar/ToVarchar never
    * error); Spark under preserveCharVarcharTypeInfo ERRORS on overflow
    * instead. Pre-truncate: `CAST(substr(CAST(e AS STRING), 1, n) AS
    * CHAR(n))` — the typed cast then pads chars back, identical when the
    * value already fits. Paren-matched scan (regexes cannot balance the
    * cast body); innermost casts rewrite first. */
  private[compat] def charCastTruncate(stmt: String): String = {
    val CastOpen = "(?is)\\bcast\\s*\\(".r
    val m = CastOpen.findFirstMatchIn(stmt).getOrElse(return stmt)
    val open = m.end - 1
    val close = HiveDdl.matchParen(stmt, open)
    if (close < 0) return stmt
    val inner = charCastTruncate(stmt.substring(open + 1, close))
    val rest = charCastTruncate(stmt.substring(close + 1))
    // the LAST depth-0 AS splits expression from target type
    val asIdx = lastTokenAtDepth0(inner, "AS")
    val rebuilt =
      if (asIdx < 0) s"${m.matched}$inner)"
      else {
        val expr = inner.substring(0, asIdx).trim
        val typ = inner.substring(asIdx + 2).trim
        "(?is)^(char|varchar)\\s*\\(\\s*(\\d+)\\s*\\)$".r.findFirstMatchIn(typ) match {
          case Some(tm) =>
            val (kind, n) = (tm.group(1).toUpperCase(java.util.Locale.ROOT), tm.group(2))
            s"CAST(substr(CAST($expr AS STRING), 1, $n) AS $kind($n))"
          case None => s"${m.matched}$inner)"
        }
      }
    stmt.substring(0, m.start) + rebuilt + rest
  }

  /** Offset of the LAST depth-0 occurrence of a keyword token. */
  private def lastTokenAtDepth0(s: String, word: String): Int = {
    var last = -1
    var from = 0
    while (from < s.length) {
      val i = tokenAtDepth0(s.substring(from), word)
      if (i < 0) return last
      last = from + i
      from = last + word.length
    }
    last
  }

  /** `t TABLESAMPLE (BUCKET x OUT OF y)` — the NO-`ON` physical form —
    * over a `CLUSTERED BY (cols) INTO n BUCKETS` table: the reference
    * reads the bucket FILES whose index ≡ x-1 (mod y); under enforced
    * bucketing each file b holds exactly the rows with
    * (getBucketHashCode(cols) & MAX_VALUE) % n = b
    * (ObjectInspectorUtils.getBucketNumber), so for every divisor/
    * multiple relation of y and n the selected ROW SET is precisely
    * `(hash(cols) & MAX_VALUE) % y = x-1` — rewritten to that filter
    * (the compat session's `hash` IS the reference chain). Tables
    * without a known CLUSTERED BY spec pass through untouched. */
  private[compat] def bucketSampleClustered(
      stmt: String, clustered: Map[String, Seq[String]]): String = {
    if (clustered.isEmpty) return stmt
    val Re = ("(?is)([\\w.`]+)\\s+tablesample\\s*\\(\\s*bucket\\s+(\\d+)\\s+out\\s+of\\s+" +
      "(\\d+)\\s*\\)(\\s+(?:as\\s+)?(?!(?i:where|group|order|limit|having|union|intersect|except|join|on|sort|cluster|distribute|left|right|full|inner|cross|lateral|tablesample|select|from)\\b)(\\w+))?").r
    Re.replaceAllIn(stmt, m => {
      val tbl = m.group(1)
      clustered.get(tbl.replace("`", "").split("\\.").last.toLowerCase) match {
        case Some(cols) =>
          val (x, y) = (m.group(2).toInt, m.group(3).toInt)
          val alias = Option(m.group(5)).getOrElse(tbl.replace("`", "").split("\\.").last)
          java.util.regex.Matcher.quoteReplacement(
            s"(SELECT * FROM $tbl WHERE (hash(${cols.mkString(", ")}) & 2147483647) % $y = ${x - 1}) $alias")
        case None => java.util.regex.Matcher.quoteReplacement(m.matched)
      }
    })
  }

  /** The reference's 2.1 GROUPING__ID bit layout (GroupByOperator /
    * `GROUPING__ID` pre-HIVE-16102): bit i (LSB-first, in GROUP BY
    * declaration order) is 1 when column i IS PRESENT in the grouping
    * set. Spark's grouping_id() is the complement in MSB-first order —
    * rewrite the token to the bit-by-bit conversion over the statement's
    * GROUP BY arity. */
  private[compat] def hiveGroupingId(stmt: String): String = {
    val GbRe = ("(?is)group\\s+by\\s+(.*?)\\s+(with\\s+(cube|rollup)\\b|" +
      "grouping\\s+sets\\b)").r
    // each grouped scope: the innermost parenthesized block holding its
    // GROUP BY (a subquery), else the whole statement — tokens outside
    // every grouped scope are COLUMN references to the aliased value
    val scopes = GbRe.findAllMatchIn(stmt).flatMap { gb =>
      val n = splitTop(gb.group(1)).size
      if (n <= 0 || n > 16) None
      else {
        val expr = (0 until n).map { i =>
          s"((1 - cast((shiftright(grouping_id(), ${n - 1 - i}) & 1) as int)) * ${1 << i})"
        }.mkString("(", " + ", ")")
        var best = (0, stmt.length)
        var i2 = 0
        while (i2 < stmt.length) {
          if (stmt.charAt(i2) == '(') {
            val c = HiveDdl.matchParen(stmt, i2)
            if (c > gb.start && i2 < gb.start && c - i2 < best._2 - best._1)
              best = (i2, c)
          }
          i2 += 1
        }
        Some((best._1, best._2, expr))
      }
    }.toSeq
    if (scopes.isEmpty) return stmt
    val sb = new StringBuilder
    var last = 0
    for (m <- "(?i)\\bGROUPING__ID\\b".r.findAllMatchIn(stmt)) {
      sb.append(stmt.substring(last, m.start))
      scopes.filter(s2 => m.start >= s2._1 && m.end <= s2._2)
        .sortBy(s2 => s2._2 - s2._1).headOption match {
        case Some((_, _, expr)) =>
          // select-list position keeps the reference's COLUMN NAME so
          // outer queries can still reference it
          val tail = stmt.substring(m.end)
          val selectPos = "(?is)^\\s*(,|from\\b)".r.findFirstIn(tail).isDefined
          sb.append(if (selectPos) s"$expr AS `grouping__id`" else expr)
        case None => sb.append("`grouping__id`")
      }
      last = m.end
    }
    sb.append(stmt.substring(last))
    sb.toString
  }

  /** Ranking/offset functions over an un-ORDERed window: the reference
    * runs them in arrival order (every row a peer); Spark refuses. An
    * injected constant ORDER BY makes all rows peers — identical
    * semantics, and the analyzer accepts the window. */
  private[compat] def orderlessRanking(stmt: String): String = {
    val Re = ("(?is)\\b(rank|dense_rank|row_number|ntile|percent_rank|" +
      "cume_dist|lag|lead|first_value|last_value)\\s*\\([^()]*\\)\\s*over\\s*\\(").r
    val sb = new StringBuilder
    var last = 0
    for (m <- Re.findAllMatchIn(stmt)) {
      if (m.start >= last) {
        val open = m.end - 1
        val close = HiveDdl.matchParen(stmt, open)
        if (close > open) {
          var body = stmt.substring(open + 1, close)
          if ("(?is)\\b(order|sort)\\s+by\\b".r.findFirstIn(body).isEmpty)
            body = body + " ORDER BY 1"
          // ranking/offset functions OWN their frame in Spark — an
          // explicit one (the reference ignores it) is rejected
          if (!Set("first_value", "last_value")(
              m.group(1).toLowerCase(java.util.Locale.ROOT)))
            body = body.replaceAll(
              "(?is)\\b(rows|range)\\s+(between\\b.*|unbounded\\b.*|current\\b.*|\\d+\\s+(preceding|following).*)$",
              "")
          sb.append(stmt.substring(last, open + 1)).append(body)
          last = close
        }
      }
    }
    sb.append(stmt.substring(last))
    sb.toString
  }

  /** Forward references between CTEs: the reference resolves the WITH
    * list as a map; Spark resolves left to right — topologically sort
    * the entries by their cross-references. */
  private[compat] def cteReorder(stmt: String): String = {
    val m = "(?is)^\\s*with\\s+".r.findFirstMatchIn(stmt).getOrElse(return stmt)
    final case class E(name: String, text: String)
    val entries = Seq.newBuilder[E]
    var i = m.end
    var ok = true
    var done = false
    while (ok && !done) {
      val nm = "(?is)^\\s*([\\w`]+)\\s+as\\s*\\(".r.findFirstMatchIn(stmt.substring(i))
      nm match {
        case Some(em) =>
          val open = i + em.end - 1
          val close = HiveDdl.matchParen(stmt, open)
          if (close < 0) ok = false
          else {
            entries += E(em.group(1).replace("`", "").toLowerCase,
              stmt.substring(i, close + 1).trim)
            // next: ',' → another entry; anything else ends the list
            var j = close + 1
            while (j < stmt.length && stmt.charAt(j).isWhitespace) j += 1
            if (j < stmt.length && stmt.charAt(j) == ',') i = j + 1
            else { i = close + 1; done = true }
          }
        case None => ok = false
      }
    }
    if (!ok) return stmt
    val es = entries.result()
    if (es.size < 2) return stmt
    val names = es.map(_.name).toSet
    def deps(e: E): Set[String] =
      "[A-Za-z_][A-Za-z_0-9]*".r.findAllIn(e.text.substring(e.text.indexOf('(')))
        .map(_.toLowerCase).toSet.intersect(names) - e.name
    // Kahn
    val remaining = scala.collection.mutable.LinkedHashMap(es.map(e => e.name -> e): _*)
    val sorted = Seq.newBuilder[E]
    var progress = true
    while (remaining.nonEmpty && progress) {
      progress = false
      remaining.find { case (_, e) => deps(e).forall(d => !remaining.contains(d)) }
        .foreach { case (n2, e) =>
          sorted += e; remaining.remove(n2); progress = true
        }
    }
    if (remaining.nonEmpty) return stmt // cycle — leave to the engine
    val result = sorted.result()
    if (result.map(_.name) == es.map(_.name)) stmt
    else stmt.substring(0, m.end) + result.map(_.text).mkString(", ") +
      " " + stmt.substring(i)
  }

  /** Inside OVER(...) groups with no ORDER/SORT BY: a RANGE frame whose
    * bounds are only CURRENT ROW / UNBOUNDED spans the whole partition
    * (all rows are peers). */
  private[compat] def rangeFrameNoOrder(stmt: String): String = {
    val over = "(?is)\\bover\\s*\\(".r
    val bound = "(?:current\\s+row|unbounded\\s+(?:preceding|following))"
    val frameRe = ("(?is)\\brange\\s+between\\s+" + bound + "\\s+and\\s+" + bound).r
    val sb = new StringBuilder
    var last = 0
    for (m <- over.findAllMatchIn(stmt)) {
      val open = m.end - 1
      val close = HiveDdl.matchParen(stmt, open)
      if (close > open && m.start >= last) {
        val body = stmt.substring(open + 1, close)
        val hasOrder = "(?is)\\b(order|sort)\\s+by\\b".r.findFirstIn(body).isDefined
        val rewritten =
          if (hasOrder)
            // a fully-unbounded RANGE frame spans the partition whatever
            // the ordering — Spark rejects it under multi-column ORDER,
            // the ROWS spelling is the identical frame
            ("(?is)\\brange\\s+between\\s+unbounded\\s+preceding\\s+and\\s+" +
              "unbounded\\s+following").r.replaceAllIn(body,
              "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING")
          else frameRe.replaceAllIn(body,
            "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING")
        sb.append(stmt.substring(last, open + 1)).append(rewritten)
        last = close
      }
    }
    sb.append(stmt.substring(last))
    sb.toString
  }

  /** One UNIQUEJOIN source: PRESERVE?, table, alias, key expressions. */
  private final case class UjEntry(preserve: Boolean, table: String,
                                   alias: String, keys: Seq[String])

  private[compat] def uniqueJoin(stmt: String): String = {
    val HeadRe = "(?is)^\\s*from\\s+uniquejoin\\s+(.*)$".r
    val m = HeadRe.findFirstMatchIn(stmt).getOrElse(return stmt)
    val rest = m.group(1)
    // the SELECT that ends the source list (depth-0)
    val selIdx = tokenAtDepth0(rest, "SELECT")
    if (selIdx < 0) return stmt
    val (srcList, tail0) = (rest.substring(0, selIdx), rest.substring(selIdx + "SELECT".length))
    val tail = tail0.trim.stripSuffix(";")
    if (tokenAtDepth0(tail, "WHERE") >= 0) return stmt // untranslated: loud decline
    val EntryRe = "(?is)^\\s*(preserve\\s+)?([\\w.`]+)\\s+(\\w+)\\s*\\((.*)\\)\\s*$".r
    val entries = splitTop(srcList).map { e =>
      EntryRe.findFirstMatchIn(e) match {
        case Some(em) => UjEntry(em.group(1) != null, em.group(2), em.group(3),
          splitTop(em.group(4)).map(_.trim))
        case None => return stmt
      }
    }
    if (entries.size < 2 || entries.map(_.keys.size).distinct.size != 1) return stmt
    val nKeys = entries.head.keys.size
    // the reference unifies key types across entries before comparing;
    // an arithmetic key anywhere makes the position numeric (double)
    def keyExpr(e: UjEntry, k: Int): String = {
      val raw = s"(${e.keys(k)})"
      if (entries.exists(x => !x.keys(k).matches("[\\w.`\\s]+"))) s"CAST($raw AS DOUBLE)" else raw
    }
    val srcs = entries.zipWithIndex.map { case (e, i) =>
      s"(SELECT *, true AS __uj_p$i FROM ${e.table}) ${e.alias}"
    }
    val joins = new StringBuilder(srcs.head)
    for (i <- 1 until entries.size) {
      val conds = (0 until nKeys).map { k =>
        val left =
          if (i == 1) keyExpr(entries(0), k)
          else s"coalesce(${(0 until i).map(j => keyExpr(entries(j), k)).mkString(", ")})"
        s"$left = ${keyExpr(entries(i), k)}"
      }
      joins.append(s" FULL OUTER JOIN ${srcs(i)} ON ${conds.mkString(" AND ")}")
    }
    val present = entries.indices.map(i => s"__uj_p$i IS NOT NULL")
    val preserved = entries.zipWithIndex.collect { case (e, i) if e.preserve => present(i) }
    val emit = (Seq(s"(${present.mkString(" AND ")})") ++ preserved).mkString(" OR ")
    s"SELECT $tail FROM $joins WHERE $emit"
  }

  /** `noop(ON t|(subquery) [alias] [partition/order/distribute/sort by
    * ...])` → the table / aliased subquery (the PTF forwards rows
    * unchanged; outer windows define their own ordering). */
  private[compat] def noopPtf(stmt: String): String = {
    val Re = "(?is)\\bnoop(?:withmap)?(?:streaming)?\\s*\\(\\s*on\\s+([\\w.`]+)((?:\\s+(?:partition|order|distribute|sort)\\s+by\\s+[\\w`\\s,.]*?)*)\\s*\\)".r
    val once0 = Re.replaceAllIn(stmt, m => java.util.regex.Matcher.quoteReplacement(m.group(1)))
    // PTF chains nest (noop(on noopwithmap(on ...))) — iterate outward
    val once = if (once0 != stmt) noopPtf(once0) else once0
    // subquery form, parsed with a paren matcher (regexes can't balance)
    val Open = "(?is)\\bnoop(?:withmap)?(?:streaming)?\\s*\\(\\s*on\\s*\\(".r
    Open.findFirstMatchIn(once) match {
      case None => once
      case Some(m) =>
        val subOpen = m.end - 1
        val subClose = HiveDdl.matchParen(once, subOpen)
        if (subClose < 0) return once
        val noopClose = HiveDdl.matchParen(once, once.lastIndexOf('(', subOpen - 1)
          match { case -1 => return once; case x => x })
        if (noopClose < subClose) return once
        val tail = once.substring(subClose + 1, noopClose)
        val aliasRe = "(?is)^\\s*(\\w+)".r
        val alias = aliasRe.findFirstMatchIn(tail).map(_.group(1))
          .filterNot(a => Set("partition", "order", "distribute", "sort")(a.toLowerCase))
          .getOrElse("__noop")
        val rewritten = once.substring(0, m.start) +
          once.substring(subOpen, subClose + 1) + " " + alias +
          once.substring(noopClose + 1)
        noopPtf(rewritten) // several PTF calls per statement
    }
  }

  /** The reference's 2.1 numeric-literal typing, which Spark's parser
    * diverges from in two ways (TypeCheckProcFactory.NumExprProcessor +
    * HiveParser.g NumberLiteral):
    *
    *  - an UNSUFFIXED fractional/exponent literal is a DOUBLE there
    *    (`Double.valueOf(text)`), a DECIMAL here — the single largest
    *    corpus value-diff family (decimal-exact sums and plain-form
    *    rendering where the reference did double math) → spell it `…D`;
    *  - a `BD` literal takes the precision/scale of its NORMALIZED value
    *    (HiveDecimal.create strips trailing zeros, so 123.0BD is
    *    decimal(3,0) rendering `123`), and one whose precision exceeds
    *    38 degrades to NULL → normalize the text, NULL-cast overflows.
    *
    * Number tokens are rewritten only outside quotes/backticks/comments
    * and never when the next word is a grammar keyword that owns plain
    * numbers (interval units, PERCENT, frame bounds). */
  private[compat] def hiveNumericLiterals(stmt: String): String = {
    val keepWords = Set("PERCENT", "PRECEDING", "FOLLOWING",
      "SECOND", "SECONDS", "MINUTE", "MINUTES", "HOUR", "HOURS",
      "DAY", "DAYS", "MONTH", "MONTHS", "YEAR", "YEARS", "WEEK", "WEEKS",
      "MILLISECOND", "MILLISECONDS", "MICROSECOND", "MICROSECONDS")
    val NumRe = "^(\\d+\\.\\d*(?:[eE][+-]?\\d+)?|\\.\\d+(?:[eE][+-]?\\d+)?|\\d+[eE][+-]?\\d+|\\d+)".r
    val sb = new StringBuilder
    var i = 0
    val n = stmt.length
    while (i < n) {
      stmt.charAt(i) match {
        case q @ ('\'' | '"' | '`') =>
          sb.append(q); i += 1
          while (i < n && stmt.charAt(i) != q) {
            if (stmt.charAt(i) == '\\' && i + 1 < n) { sb.append(stmt.charAt(i)).append(stmt.charAt(i + 1)); i += 2 }
            else { sb.append(stmt.charAt(i)); i += 1 }
          }
          if (i < n) { sb.append(q); i += 1 }
        case '-' if i + 1 < n && stmt.charAt(i + 1) == '-' =>
          val e = stmt.indexOf('\n', i) match { case -1 => n; case x => x }
          sb.append(stmt.substring(i, e)); i = e
        case '/' if i + 1 < n && stmt.charAt(i + 1) == '*' =>
          val e = stmt.indexOf("*/", i + 2) match { case -1 => n; case x => x + 2 }
          sb.append(stmt.substring(i, e)); i = e
        case c if (c.isDigit || (c == '.' && i + 1 < n && stmt.charAt(i + 1).isDigit)) &&
            (i == 0 || !isNumBoundary(stmt.charAt(i - 1))) =>
          val m = NumRe.findFirstMatchIn(stmt.substring(i)).get
          val tok = m.group(1)
          val after = i + tok.length
          val fractional = tok.exists(ch => ch == '.' || ch == 'e' || ch == 'E')
          def nextWord: String = {
            var j = after
            while (j < n && stmt.charAt(j).isWhitespace) j += 1
            val s = j
            while (j < n && stmt.charAt(j).isLetter) j += 1
            stmt.substring(s, j).toUpperCase(java.util.Locale.ROOT)
          }
          if (after + 1 < n && (stmt.charAt(after) == 'B' || stmt.charAt(after) == 'b') &&
              (stmt.charAt(after + 1) == 'D' || stmt.charAt(after + 1) == 'd') &&
              (after + 2 >= n || !isNumBoundary(stmt.charAt(after + 2)))) {
            // BD literal: normalized precision/scale, NULL past 38
            val v0 = new java.math.BigDecimal(tok).stripTrailingZeros
            // HiveDecimal holds no negative scales: 1E99 is 100 integer
            // digits, not precision 1 — measure on the plain form
            val v = v0.setScale(math.max(v0.scale, 0))
            if (v.precision > 38) sb.append("CAST(NULL AS DECIMAL(1,0))")
            else sb.append(v.toPlainString).append("BD")
            i = after + 2
          } else if (fractional && after < n && !isNumBoundary(stmt.charAt(after)) &&
              !keepWords(nextWord)) {
            sb.append(tok).append('D'); i = after
          } else if (fractional && after >= n) {
            sb.append(tok).append('D'); i = after
          } else { sb.append(tok); i = after }
        case c => sb.append(c); i += 1
      }
    }
    sb.toString
  }

  private def isNumBoundary(c: Char): Boolean = c.isLetterOrDigit || c == '_' || c == '.'

  // ------------------------------------------------------------------ //
  // depth-0 scanning helpers (quote/comment-aware)                      //
  // ------------------------------------------------------------------ //

  /** Offset of a depth-0 keyword token, -1 if absent. */
  private[compat] def tokenAtDepth0(s: String, word: String): Int = {
    var i = 0
    var depth = 0
    val w = word.length
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case '\'' | '"' | '`' =>
          val q = s.charAt(i); i += 1
          while (i < s.length && s.charAt(i) != q) {
            if (s.charAt(i) == '\\') i += 2 else i += 1
          }
          i += 1
        case '-' if i + 1 < s.length && s.charAt(i + 1) == '-' =>
          i = s.indexOf('\n', i) match { case -1 => s.length; case n => n }
        case c if depth == 0 && c.toUpper == word.charAt(0) &&
            s.regionMatches(true, i, word, 0, w) &&
            (i == 0 || !isIdent(s.charAt(i - 1))) &&
            (i + w >= s.length || !isIdent(s.charAt(i + w))) =>
          return i
        case _ => i += 1
      }
    }
    -1
  }

  private def isIdent(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** The reference DE-DUPLICATES its grouping-set list — `GROUP BY a
    * GROUPING SETS ((a), (a))` emits every group ONCE (the sets become
    * a bitmask SET during analysis; groupby_grouping_sets1's and
    * groupby_grouping_sets_limit's goldens both carry 5 rows over 5
    * keys) — where Spark keeps each occurrence as its own grouping-set
    * branch and emits doubles. Drop repeated sets, first spelling
    * kept. */
  private def duplicateGroupingSets(stmt: String): String = {
    val Re = ("(?is)^(\\s*select\\b.*?)\\bgroup\\s+by\\b.*?" +
      "\\bgrouping\\s+sets\\s*\\(").r
    val m = Re.findFirstMatchIn(stmt).getOrElse(return stmt)
    val open = m.end - 1
    var depth = 0
    var close = -1
    var i = open
    while (i < stmt.length && close < 0) {
      stmt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) close = i
        case _ =>
      }
      i += 1
    }
    if (close < 0) return stmt
    val sets = splitTop(stmt.substring(open + 1, close))
    def norm(x: String) =
      x.trim.stripPrefix("(").stripSuffix(")").replaceAll("\\s+", "").toLowerCase
    val seen = scala.collection.mutable.Set.empty[String]
    val kept = sets.filter(x => seen.add(norm(x)))
    if (kept.size == sets.size) return stmt
    stmt.substring(0, open + 1) + kept.mkString(", ") + stmt.substring(close)
  }

  /** Split on depth-0 commas. */
  private[compat] def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; cur.append('(')
      case ')' => depth -= 1; cur.append(')')
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case ch => cur.append(ch)
    }
    if (cur.nonEmpty) out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
