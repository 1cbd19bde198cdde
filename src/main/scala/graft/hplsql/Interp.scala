package graft.hplsql

import java.time.{LocalDate, LocalDateTime}
import java.time.format.DateTimeFormatter

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Row, SparkSession}

import Ast._

/** Tree-walking interpreter for HPL/SQL over a SparkSession.
  *
  * Behavioral contract is the reference interpreter
  * (hplsql/src/main/java/org/apache/hive/hplsql/Exec.java + Stmt.java +
  * Expression.java), pinned by its own test corpus
  * (hplsql/src/test/queries/local and .../db scripts + result files):
  *
  *  - Control-flow scalars evaluate NATIVELY (arithmetic, comparison,
  *    `||`, CASE, BETWEEN, the NVL/INSTR/SUBSTR builtin family) — a WHILE
  *    loop never round-trips through the engine per iteration, exactly as
  *    the reference evaluates in the JVM (Expression.java) and only ships
  *    set-based statements to the database (Conn.java).
  *  - Set-based statements pass through to `spark.sql` with declared
  *    variables substituted as literals (Exec.java's
  *    exec_var substitution); unknown scalar functions in expressions
  *    also fall back to one-row `SELECT fn(...)` against Spark, which
  *    gives the procedural layer the engine's whole scalar surface.
  *  - Scoping: FOR-loop variables are loop-local (for_range.out.txt pins
  *    that the outer `i` survives untouched); routines execute in a fresh
  *    scope; OUT parameters write back to the caller's variable
  *    (create_procedure.out.txt).
  *  - Exceptions: statements raise `HplError`; a BEGIN..EXCEPTION block
  *    catches via WHEN <condition>/OTHERS (exception.out.txt: unknown
  *    cursor raises; divide-by-zero assigns NULL then raises,
  *    exception_divide_by_zero.out.txt). `SET *.onerror = SETERROR`
  *    downgrades SQL errors to SQLCODE/ERRORCODE (seterror.sql).
  *
  * Scale note: the procedural layer is driver-side BY DESIGN — it is the
  * orchestration shell around set-based Spark SQL, the same division of
  * labor the reference has (its Exec drives a remote HiveServer2). Data
  * never flows through the interpreter except explicit INTO/FETCH rows.
  */
object Hplsql {

  final case class HplError(cond: String, msg: String) extends RuntimeException(msg)

  private final case class ExitLoop(label: Option[String]) extends RuntimeException

  /** HPL/SQL identifiers (loop labels included) are case-insensitive. */
  private def labelEq(a: Option[String], b: Option[String]): Boolean =
    a.map(_.toUpperCase) == b.map(_.toUpperCase)
  private final case class ReturnEx(value: Any) extends RuntimeException

  private final class Variable(var value: Any, val dtype: String)

  private final class CursorState(val sql: Seq[Token]) {
    var open = false
    var rows: Iterator[Row] = Iterator.empty
    var cols: Seq[String] = Nil
    var found: Option[Boolean] = None // None until first FETCH (c%FOUND IS NULL)
    var dynamicSql: Option[String] = None // OPEN-FOR resolved text (refcursors)
    var withReturn = false // DECLARE ... CURSOR WITH RETURN (DB2 result sets)
  }

  /** One record from a cursor/rowtype — field access is case-insensitive. */
  private final class Rec(val fields: Seq[(String, Any)]) {
    def get(name: String): Any =
      fields.find(_._1.equalsIgnoreCase(name)) match {
        case Some((_, v)) => v
        case None => throw HplError("UNDEFINED", s"Field not found: $name")
      }
  }

  private final case class Routine(params: Seq[Param], body: Seq[Stmt], isFunction: Boolean)

  /** A package: persistent variable scope + member routines (reference
    * Package.java — the `users.add` counter in create_package.sql pins
    * that package state survives across calls). */
  private final class Pkg {
    val scope = mutable.LinkedHashMap.empty[String, Variable]
    val routines = mutable.Map.empty[String, Routine]
  }

  final case class Result(output: String, exitVars: Map[String, Any])

  /** Run a script; returns printed output and the final top-scope vars. */
  def run(spark: SparkSession, script: String,
          out: String => Unit = _ => ()): Result = {
    val interp = new Interp(spark, out)
    try interp.execProgram(Parser.parse(script))
    catch { case ReturnEx(_) => () } // top-level RETURN exits the script
    Result(interp.printed.toString,
      interp.globalScope.map { case (k, v) => (k, v.value) }.toMap)
  }

  private final class Interp(spark: SparkSession, sink: String => Unit) {
    val printed = new StringBuilder
    // scope chain: head = innermost
    private var scopes: List[mutable.LinkedHashMap[String, Variable]] =
      List(mutable.LinkedHashMap.empty)
    private val cursors = mutable.Map.empty[String, CursorState]
    private val routines = mutable.Map.empty[String, Routine]
    private val packages = mutable.Map.empty[String, Pkg]
    private var currentPkg: Option[Pkg] = None
    // DB2 result-set flow: proc name -> queue of returned open cursors
    private val resultSets = mutable.Map.empty[String, mutable.Queue[CursorState]]
    private var returnCursorBuf: Option[mutable.ArrayBuffer[CursorState]] = None
    private val conditions = mutable.Set.empty[String]
    private val conf = mutable.Map.empty[String, String]

    def globalScope: mutable.LinkedHashMap[String, Variable] = scopes.last

    private def emit(s: String): Unit = { printed.append(s).append('\n'); sink(s) }

    private def findVar(name: String): Option[Variable] = {
      val key = name.toLowerCase
      scopes.iterator.flatMap(_.get(key)).nextOption()
    }
    private def declare(name: String, dtype: String, v: Any): Unit =
      scopes.head.put(name.toLowerCase, new Variable(v, dtype))
    private def setVar(name: String, v: Any): Unit = findVar(name) match {
      case Some(slot) => slot.value = v
      case None       => declare(name, "STRING", v) // implicit declaration (assign.sql)
    }

    private def pushScope(): Unit = { scopes = mutable.LinkedHashMap.empty[String, Variable] :: scopes }
    private def popScope(): Unit = { scopes = scopes.tail }

    /** Execute a statement list with handler support: DECLARE ... HANDLER
      * registered by earlier statements catches errors from later ones;
      * an EXIT handler aborts the remaining statements, a CONTINUE
      * handler resumes after the failed one (declare_condition.sql,
      * create_procedure2.sql). Block-level EXCEPTION sections are passed
      * in as always-exit handlers. */
    private def execSeq(body: Seq[Stmt], blockHandlers: Seq[(String, Seq[Stmt])]): Unit = {
      var i = 0
      var aborted = false
      while (i < body.length && !aborted) {
        try exec(body(i))
        catch {
          case err: HplError =>
            val fromBlock = blockHandlers.map { case (c, b) => (c, b, true) }
            val all = handlers.reverse ++ fromBlock
            all.find { case (cond, _, _) =>
              cond == "OTHERS" || cond == "SQLEXCEPTION" || cond.equalsIgnoreCase(err.cond)
            } match {
              case Some((_, hbody, isExit)) =>
                val savedErr = currentError
                currentError = Some(err)
                try hbody.foreach(exec) finally currentError = savedErr
                if (isExit) aborted = true
              case None => throw err
            }
        }
        i += 1
      }
    }

    def execProgram(stmts: Seq[Stmt]): Unit = execSeq(stmts, Nil)

    // ---- statements --------------------------------------------------------

    private def exec(s: Stmt): Unit = s match {
      case DeclareVar(names, dtype, init) =>
        val v = init.map(eval).map(coerce(_, dtype)).orNull
        names.foreach(n => declare(n, dtype, v))
      case DeclareCursor(name, sql, withReturn) =>
        val c = new CursorState(sql)
        c.withReturn = withReturn
        cursors(name.toLowerCase) = c
      case AllocateCursor(name, proc) =>
        val q = resultSets.getOrElse(proc.toLowerCase,
          throw HplError("UNDEFINED", s"No result sets returned by: $proc"))
        if (q.isEmpty) throw HplError("UNDEFINED", s"No unconsumed result set of: $proc")
        setVar(name, q.dequeue())
      case AssociateLocator(locs, proc) =>
        // each locator var takes the procedure's next returned result
        // set, in order (DB2 ASSOCIATE ... WITH PROCEDURE)
        val q = resultSets.getOrElse(proc.toLowerCase,
          throw HplError("UNDEFINED", s"No result sets returned by: $proc"))
        locs.foreach { l =>
          if (q.isEmpty) throw HplError("UNDEFINED", s"No unconsumed result set of: $proc")
          setVar(l, q.dequeue())
        }
      case AllocateCursorLoc(name, loc) =>
        findVar(loc).map(_.value) match {
          case Some(c: CursorState) => setVar(name, c)
          case _ => throw HplError("UNDEFINED",
            s"locator $loc is not associated with a result set")
        }
      case DeclGroup(items) => items.foreach(exec)
      case DeclareCondition(name) =>
        conditions += name.toUpperCase
      case DeclareHandler(exit, cond, body) =>
        handlers = (cond, body, exit) :: handlers
      case Assign(targets, values) =>
        val vs = values.map(evalCatchingZeroDivide)
        targets.lazyZip(vs).foreach { case (t, (v, err)) =>
          setVar(t, v)
          err.foreach(throw _) // divide-by-zero: assign NULL, then raise
        }
      case ConfSet(key, value) => conf(key) = value
      case Print(e) => e match {
        // a bare UNDEFINED identifier prints its own name — the
        // reference's Var(Type.IDENT, name).toString():568 returns the
        // name while every OPERATION sees the var as null (isNull:557)
        case Some(VarRef(n)) if findVar(n).isEmpty &&
            !Set("CURRENT_DATE", "SYSDATE", "CURRENT_TIMESTAMP", "NOW",
                 "HOSTCODE", "SQLCODE", "ERRORCODE", "SQLSTATE")(n.toUpperCase) =>
          emit(n)
        case _ => emit(e.map(v => render(eval(v))).getOrElse(""))
      }
      case IfS(branches, els) =>
        branches.find(b => truthy(eval(b._1))) match {
          case Some((_, body)) => body.foreach(exec)
          case None            => els.foreach(exec)
        }
      case w @ WhileS(cond, body, label) =>
        try {
          while (truthy(eval(cond))) body.foreach(exec)
        } catch {
          case ExitLoop(l) if l.isEmpty || labelEq(l, label) => ()
        }
      case f @ ForRange(v, fromE, toE, byE, reverse, body, label) =>
        val from = toLong(eval(fromE))
        val to = toLong(eval(toE))
        val by = byE.map(e => toLong(eval(e))).getOrElse(1L)
        pushScope()
        declare(v, "BIGINT", from)
        try {
          var i = if (reverse) math.max(from, to) else from
          val end = if (reverse) math.min(from, to) else to
          var cont = if (reverse) i >= end else i <= end
          while (cont) {
            scopes.head(v.toLowerCase).value = i
            body.foreach(exec)
            i = if (reverse) i - by else i + by
            cont = if (reverse) i >= end else i <= end
          }
        } catch {
          case ExitLoop(l) if l.isEmpty || labelEq(l, label) => ()
        } finally popScope()
      case ForCursor(rec, sql, body, label) =>
        val df = try runSql(renderSql(sql)) catch {
          case e: HplError => throw e
          case e: Exception => throw HplError("SQLEXCEPTION", e.getMessage)
        }
        val cols = df.columns.toSeq
        pushScope()
        try {
          val it = df.toLocalIterator().asScala
          var more = true
          while (more) {
            // iteration runs the Spark job lazily — keep runtime SQL errors
            // on the same catchable path as analysis errors
            val next =
              try { if (it.hasNext) Some(it.next()) else None }
              catch { case e: Exception if !e.isInstanceOf[HplError] &&
                !e.isInstanceOf[ExitLoop] && !e.isInstanceOf[ReturnEx] =>
                throw HplError("SQLEXCEPTION", e.getMessage) }
            next match {
              case Some(row) =>
                declare(rec, "ROW", new Rec(cols.map(c => (c, fromSpark(row.getAs[Any](c))))))
                body.foreach(exec)
              case None => more = false
            }
          }
        } catch {
          case ExitLoop(l) if l.isEmpty || labelEq(l, label) => ()
        } finally popScope()
      case ExitS(label, when) =>
        if (when.forall(e => truthy(eval(e)))) throw ExitLoop(label)
      case OpenCur(name, forSql) =>
        val c = forSql match {
          case Some(sqlToks) =>
            // SYS_REFCURSOR: the cursor is a VALUE in a variable; static
            // tokens or a single string expression (dynamic OPEN-FOR)
            val sql = sqlToks match {
              case Seq(one) if one.kind == Tok.Str => one.text
              case Seq(one) if one.kind == Tok.Ident && findVar(one.text).exists(_.value.isInstanceOf[String]) =>
                substituteVars(findVar(one.text).get.value.asInstanceOf[String])
              case toks => renderSql(toks)
            }
            val fresh = new CursorState(sqlToks)
            setVar(name, fresh)
            fresh.dynamicSql = Some(sql)
            fresh
          case None => cursor(name)
        }
        val df = try runSql(c.dynamicSql.getOrElse(renderSql(c.sql))) catch {
          case e: HplError => throw e
          case e: Exception => throw HplError("SQLEXCEPTION", e.getMessage)
        }
        c.cols = df.columns.toSeq
        c.rows = df.toLocalIterator().asScala
        c.open = true
        c.found = None
        if (c.withReturn) returnCursorBuf.foreach(_ += c)
      case FetchCur(name, into) =>
        val c = cursorRef(name).getOrElse(
          throw HplError("UNDEFINED", s"Cursor not found: $name"))
        if (!c.open) throw HplError("CURSOR_NOT_OPEN", s"Cursor not open: $name")
        // toLocalIterator is lazy: the Spark job for a partition runs at
        // hasNext/next, so runtime SQL errors surface HERE, not at OPEN —
        // wrap them into the same catchable condition as analysis errors
        val hasRow =
          try c.rows.hasNext
          catch { case e: Exception if !e.isInstanceOf[HplError] =>
            throw HplError("SQLEXCEPTION", e.getMessage) }
        if (hasRow) {
          val row = c.rows.next()
          c.found = Some(true)
          setVar("SQLCODE", BigDecimal(0)) // DB2 loop idiom: WHILE SQLCODE = 0
          if (into.length == 1 && c.cols.length > 1) {
            setVar(into.head, new Rec(c.cols.map(col => (col, fromSpark(row.getAs[Any](col))))))
          } else {
            into.lazyZip(c.cols.take(into.length)).foreach { (v, col) =>
              setVar(v, fromSpark(row.getAs[Any](col)))
            }
          }
        } else {
          c.found = Some(false)
          setVar("SQLCODE", BigDecimal(100))
        }
      case CloseCur(name) =>
        cursorRef(name).foreach(_.open = false)
      case SelectInto(sql, into) =>
        runSelectInto(renderSql(sql), into)
      case ExecName(name) =>
        // `EXEC name;`: a registered procedure is a CALL; otherwise the
        // name must be a variable holding dynamic SQL (the reference's
        // exec_immediate over an ident) — same error as before if neither
        if (resolveRoutine(name).isDefined) { callRoutine(name, Nil); () }
        else exec(ExecDyn(VarRef(name), Nil))
      case ExecDyn(sqlE, into) =>
        val text = Option(eval(sqlE)).map(_.toString)
          .getOrElse(throw HplError("UNDEFINED", "EXECUTE of NULL statement"))
        if (into.nonEmpty) runSelectInto(substituteVars(text), into)
        else {
          try { runSql(substituteVars(text)); () }
          catch {
            case e: HplError => throw e
            case e: Exception => sqlError(e) // same handler/SETERROR path as passthrough
          }
        }
      case ValuesInto(values, into) =>
        into.lazyZip(values.map(eval)).foreach((t, v) => setVar(t, v))
      case CreateRoutine(name, params, body, isFunction) =>
        routines(name.toLowerCase) = Routine(params, body, isFunction)
      case CreatePackage(name, members, _) =>
        val pkg = packages.getOrElseUpdate(name.toLowerCase, new Pkg)
        // member decls evaluate against (package scope :: global)
        val saved = scopes
        scopes = pkg.scope :: List(globalScope)
        try members.foreach {
          case r @ CreateRoutine(rn, params, body, isFunction) =>
            pkg.routines(rn.toLowerCase) = Routine(params, body, isFunction)
          case DeclGroup(items) => items.foreach(exec)
          case NullS => ()
          case decl => exec(decl)
        } finally scopes = saved
      case IncludeS(tokens) =>
        val path =
          if (tokens.headOption.exists(_.kind == Tok.Str))
            render(eval(new Parser(tokens.toVector :+ Token(Tok.EOF, "", 0)).parseExpr()))
          else tokens.map(_.text).mkString // bare unquoted path
        // relative includes resolve against the CWD first, then against
        // `graft.hplsql.include.dir` (the reference resolves against its
        // own CWD — the conf lets a caller replay corpus scripts whose
        // includes hardcode that layout)
        val p0 = java.nio.file.Paths.get(path.trim)
        val p =
          if (java.nio.file.Files.exists(p0) || p0.isAbsolute) p0
          else spark.conf.getOption("graft.hplsql.include.dir")
            .map(d => java.nio.file.Paths.get(d).resolve(path.trim))
            .filter(java.nio.file.Files.exists(_))
            .getOrElse(p0)
        val text = new String(java.nio.file.Files.readAllBytes(p))
        execProgram(Parser.parse(text))
      case CallProc(name, args) =>
        // bare call statement: a FUNCTION's result prints (the reference's
        // expr_stmt — `get('abc');` in create_function4.sql prints the
        // return value; procedures return null and print nothing). Names
        // that are not routines fall back to the builtin/engine surface
        // (`LOWER('ABC');` prints `abc`, lower.sql).
        if (resolveRoutine(name).isDefined) {
          val v = callRoutine(name, args)
          if (v != null) emit(render(v)) // function result prints; procedures (null) don't
        } else emit(render(evalBuiltin(name.toUpperCase, args))) // null prints as `null`
      case ReturnS(e) => throw ReturnEx(e.map(eval).orNull)
      case Block(decls, body, blockHandlers) =>
        pushScope()
        val savedHandlers = handlers
        handlers = Nil
        try {
          decls.foreach(exec)
          execSeq(body, blockHandlers)
        } finally { handlers = savedHandlers; popScope() }
      case SqlPassthrough(tokens) =>
        val sql = renderSql(tokens)
        try {
          val df = runSql(sql)
          // DESCRIBE prints its rows tab-separated (reference
          // Stmt.describe — db corpus describe.out.txt: col \t type \t
          // comment, nulls empty); other passthrough statements are
          // executed for effect only
          if ("""(?is)^\s*DESC(RIBE)?\b.*""".r.matches(sql))
            df.collect().foreach(r => emit((0 until r.length)
              .map(i => Option(r.get(i)).map(String.valueOf).getOrElse(""))
              .mkString("\t")))
          ()
        }
        catch {
          case e: HplError => throw e
          case e: Exception => sqlError(e)
        }
      case HostCmd(cmdE) =>
        // HOST 'cmd' — reference Exec.execHost: Runtime.exec (whitespace
        // tokenized, NO shell); a process that RUNS puts its exit code in
        // HOSTCODE without raising, a command that cannot START sets
        // HOSTCODE=1 and signals SQLEXCEPTION (seterror.out.txt: HOST
        // 'abcd' lands in the WHEN OTHERS handler), which
        // hplsql.onerror=SETERROR downgrades like any SQL error.
        val cmd = Option(eval(cmdE)).map(_.toString).getOrElse("")
        try {
          val code = new ProcessBuilder(cmd.trim.split("\\s+").toSeq: _*)
            .redirectOutput(ProcessBuilder.Redirect.DISCARD)
            .redirectError(ProcessBuilder.Redirect.DISCARD)
            .start().waitFor()
          setVar("HOSTCODE", BigDecimal(code))
        } catch { case e: Exception =>
          setVar("HOSTCODE", BigDecimal(1))
          sqlError(e)
        }
      case CmpS(mode, left, right) => execCmp(mode, left, right)
      case CopyS(src, target, toFile, delim, sqlIns) =>
        execCopy(src, target, toFile, delim, sqlIns)
      case SignalS(cond) => throw HplError(cond, s"Signal: $cond")
      case RaiseS =>
        throw currentError.getOrElse(HplError("USER_RAISE", "RAISE outside a handler"))
      case ExprStmt(e) =>
        // bare expression statements print their value (sub.out.txt:
        // `DATE '2015-01-01' - 1;` prints 2014-12-31; NULL prints `null`)
        emit(render(eval(e)))
      case NullS => ()
    }

    private var handlers: List[(String, Seq[Stmt], Boolean)] = Nil
    private var currentError: Option[HplError] = None

    /** COPY ... TO (reference Copy.java). Table targets stay SET-BASED —
      * CTAS when the target does not exist, INSERT INTO SELECT when it
      * does (the reference issues row-wise INSERTs over JDBC; on one
      * engine a relational write is strictly better and scales). File
      * targets are a DRIVER-SIDE export utility by design (delimited
      * lines or SQLINSERT statements, matching Copy.java's two modes):
      * row-at-a-time through toLocalIterator, for operator-scale
      * extracts; bulk exports belong to INSERT OVERWRITE DIRECTORY
      * (etl.MultiInsert, q191), which writes from the executors. */
    private def execCopy(src: Seq[Token], target: String, toFile: Boolean,
                         delim: Option[String], sqlIns: Option[String]): Unit = {
      val text = renderSql(src)
      val df =
        try {
          if (src.headOption.exists(t => (t.kind == Tok.Op && t.text == "(") || t.is("SELECT")))
            runSql(if (text.startsWith("(")) s"SELECT * FROM $text t" else text)
          else runSql(s"SELECT * FROM $text")
        } catch {
          case e: HplError => throw e
          case e: Exception => throw HplError("SQLEXCEPTION", e.getMessage)
        }
      try {
        if (!toFile) {
          if (spark.catalog.tableExists(target))
            df.write.mode("append").insertInto(target)
          else
            df.write.saveAsTable(target)
        } else {
          val sep = delim.getOrElse(if (sqlIns.isDefined) ", " else "\t")
          val path = java.nio.file.Paths.get(target)
          Option(path.getParent).foreach(java.nio.file.Files.createDirectories(_))
          val w = java.nio.file.Files.newBufferedWriter(path)
          try df.toLocalIterator().asScala.foreach { row =>
            val vals = (0 until row.length).map { i =>
              val v = fromSpark(row.get(i))
              sqlIns match {
                case Some(_) => literal(v)
                case None    => if (v == null) "" else render(v)
              }
            }
            val line = sqlIns match {
              case Some(tbl) => s"INSERT INTO $tbl VALUES (${vals.mkString(sep)});"
              case None      => vals.mkString(sep)
            }
            w.write(line); w.newLine()
          } finally w.close()
        }
      } catch {
        case e: HplError => throw e
        case e: Exception => throw HplError("SQLEXCEPTION", e.getMessage)
      }
    }

    /** CMP ROW_COUNT | CMP SUM (reference Cmp.java): both sides reduce to
      * ONE aggregation row each — COUNT(1), plus per-column type-directed
      * sums for SUM mode (numeric → SUM(col); string → SUM(LENGTH(col));
      * date/timestamp → SUM(YEAR/MONTH/DAY)) — and each measure prints as
      * `name\tv1\tv2` (cmp_row_count.out.txt format). Scale note: the diff
      * never moves rows — each side is a map-combinable aggregate, so
      * comparing two 100 TB tables costs two scans and two 1-row results. */
    private def execCmp(mode: String, left: Seq[Token], right: Seq[Token]): Unit = {
      def sideDf(src: Seq[Token]): org.apache.spark.sql.DataFrame = {
        val text = renderSql(src)
        val df =
          if (src.headOption.exists(t => t.kind == Tok.Op && t.text == "(") ||
              src.headOption.exists(_.is("SELECT")))
            runSql(if (text.startsWith("(")) s"SELECT * FROM $text t" else text)
          else runSql(s"SELECT * FROM $text")
        df
      }
      def measures(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        import org.apache.spark.sql.functions.{expr => sexpr}
        val aggs = mutable.ArrayBuffer(sexpr("COUNT(1)").as("row_count"))
        if (mode == "SUM") df.schema.fields.foreach { f =>
          import org.apache.spark.sql.types._
          f.dataType match {
            case StringType =>
              aggs += sexpr(s"SUM(LENGTH(`${f.name}`))").as(s"${f.name}_sum_length")
            case _: NumericType =>
              aggs += sexpr(s"SUM(`${f.name}`)").as(s"${f.name}_sum")
            case DateType | TimestampType | TimestampNTZType =>
              aggs += sexpr(s"SUM(YEAR(`${f.name}`))").as(s"${f.name}_sum_year")
              aggs += sexpr(s"SUM(MONTH(`${f.name}`))").as(s"${f.name}_sum_month")
              aggs += sexpr(s"SUM(DAY(`${f.name}`))").as(s"${f.name}_sum_day")
            case _ => () // complex/binary columns are not comparable sums
          }
        }
        df.agg(aggs.head, aggs.tail.toSeq: _*)
      }
      try {
        val r1 = measures(sideDf(left)).collect()(0)
        val r2 = measures(sideDf(right)).collect()(0)
        val cols1 = r1.schema.fieldNames
        val cols2 = r2.schema.fieldNames.toSet
        cols1.foreach { c =>
          val v1 = render(fromSpark(r1.getAs[Any](c)))
          val v2 = if (cols2.contains(c)) render(fromSpark(r2.getAs[Any](c))) else "<missing>"
          emit(s"$c\t$v1\t$v2")
        }
      } catch {
        case e: HplError => throw e
        case e: Exception => throw HplError("SQLEXCEPTION", e.getMessage)
      }
    }

    private def cursor(name: String): CursorState =
      cursors.getOrElse(name.toLowerCase,
        throw HplError("UNDEFINED", s"Cursor not found: $name"))

    /** Resolve a name to cursor state: declared cursor OR a variable
      * holding a refcursor value (which travels through OUT params). */
    private def cursorRef(name: String): Option[CursorState] =
      cursors.get(name.toLowerCase)
        .orElse(findVar(name).map(_.value).collect { case c: CursorState => c })

    private def sqlError(e: Exception): Unit = {
      // exactly Conf.ONERROR = "hplsql.onerror" — seterror.sql assigns the
      // TYPO'd `plhql.onerror` and the reference still raises (its handler
      // fires), so a suffix match here would replay the script wrong
      val onerror = conf.get("hplsql.onerror")
      if (onerror.contains("SETERROR")) {
        setVar("SQLCODE", BigDecimal(-1))
        setVar("ERRORCODE", BigDecimal(-1))
        setVar("SQLSTATE", "02000")
      } else throw HplError("SQLEXCEPTION", e.getMessage)
    }

    private def runSql(sql: String): org.apache.spark.sql.DataFrame =
      // constraint DDL (ADD/DROP CONSTRAINT) is a grammar Spark lacks;
      // route it to the engine's registry exactly as the reference routes
      // it to DDLTask (HiveParser.g alterStatementSuffixAddConstraint)
      if (graft.plans.ConstraintDdl.matches(sql)) {
        graft.plans.ConstraintDdl.run(sql)
        spark.emptyDataFrame
      } else if (graft.plans.MvDdl.matches(sql)) {
        graft.plans.MvDdl.run(spark, sql)
        spark.emptyDataFrame
      } else if (graft.security.AuthDdl.matches(sql)) {
        // GRANT / REVOKE / SHOW GRANT (HiveParser.g grantPrivileges) —
        // grammar Spark lacks, routed to the engine's grant store
        graft.security.AuthDdl.run(spark, sql)
      } else if (graft.acid.TxnDdl.matches(sql)) {
        // SHOW LOCKS / SHOW TRANSACTIONS / SHOW COMPACTIONS / ABORT
        // (HiveParser.g showStatement, abortTransactionStatement)
        graft.acid.TxnDdl.run(spark, sql)
      } else if (graft.plans.ExplainDdl.matches(sql)) {
        // EXPLAIN DEPENDENCY / AUTHORIZATION (ExplainTask.java:88)
        graft.plans.ExplainDdl.run(spark, sql)
      } else if ("""(?is)^\s*TRUNCATE\s+(?!TABLE\b)\w.*""".r.matches(sql)) {
        // `TRUNCATE t` without the TABLE keyword — reference grammar
        // truncate_stmt makes TABLE optional (db corpus truncate_table
        // .sql); Spark requires it
        spark.sql(sql.replaceFirst("(?is)^\\s*TRUNCATE\\s+", "TRUNCATE TABLE "))
      } else if (graft.acid.ConcatenateDdl.matches(sql)) {
        // ALTER TABLE ... CONCATENATE (alterStatementSuffixMergeFiles)
        graft.acid.ConcatenateDdl.run(spark, sql)
      } else if (graft.functions.FunctionDdl.matches(sql)) {
        // CREATE/DROP FUNCTION ... AS 'class' — compiled-UDF deployment
        // (FunctionSemanticAnalyzer / FunctionTask)
        graft.functions.FunctionDdl.run(spark, sql)
      } else spark.sql(sql)

    private def runSelectInto(sql: String, into: Seq[String]): Unit = {
      val rows = try runSql(sql).limit(1).collect()
        catch { case e: Exception => sqlError(e); return }
      if (rows.isEmpty) {
        into.foreach(setVar(_, null))
        setVar("SQLCODE", BigDecimal(100))
      } else {
        val row = rows.head
        val cols = row.schema.fieldNames.toSeq
        if (into.length == 1 && cols.length > 1) {
          // multi-column into one target = record assignment (%ROWTYPE kin)
          setVar(into.head, new Rec(cols.map(c => (c, fromSpark(row.getAs[Any](c))))))
        } else {
          into.lazyZip(cols.take(into.length)).foreach { (v, c) =>
            setVar(v, fromSpark(row.getAs[Any](c)))
          }
        }
        setVar("SQLCODE", BigDecimal(0))
      }
    }

    /** Resolve `name` / `pkg.name`: package-local members first when
      * executing inside a package body (private procedures, sp3 in the
      * reference's create_package.sql), then the global registry. */
    private def resolveRoutine(name: String): Option[(Option[Pkg], Routine)] = {
      val dot = name.indexOf('.')
      if (dot > 0) {
        val pkg = packages.get(name.substring(0, dot).toLowerCase)
        pkg.flatMap(p => p.routines.get(name.substring(dot + 1).toLowerCase).map(r => (Some(p), r)))
      } else {
        currentPkg.flatMap(p => p.routines.get(name.toLowerCase).map(r => (Some(p), r)))
          .orElse(routines.get(name.toLowerCase).map(r => (None, r)))
      }
    }

    private def callRoutine(name: String, args: Seq[Expr]): Any = {
      val (pkgOpt, r) = resolveRoutine(name).getOrElse(
        throw HplError("UNDEFINED", s"Procedure or function not found: $name"))
      val argVals = args.map {
        case VarRef(n) => (Some(n), findVar(n).map(_.value).orNull)
        case e         => (None, eval(e))
      }
      // routines run in their OWN chain: args :: [package scope] :: global
      // (caller locals invisible; package members see package state)
      val savedScopes = scopes
      val savedPkg = currentPkg
      val savedBuf = returnCursorBuf
      val myBuf = mutable.ArrayBuffer.empty[CursorState]
      returnCursorBuf = Some(myBuf)
      val argScope = mutable.LinkedHashMap.empty[String, Variable]
      scopes = argScope :: (pkgOpt.map(_.scope).toList :+ globalScope)
      currentPkg = pkgOpt
      val outBindings = mutable.ArrayBuffer.empty[(String, String)] // param -> caller var
      val (result, outVals) =
        try {
          r.params.zipWithIndex.foreach { case (p, i) =>
            val v = if (i < argVals.length) argVals(i)._2 else p.default.map(eval).orNull
            declare(p.name, p.dtype, if (p.out && !p.in) null else v)
            if (p.out && i < argVals.length)
              argVals(i)._1.foreach(cv => outBindings += ((p.name, cv)))
          }
          val res =
            try { r.body.foreach(exec); null }
            catch { case ReturnEx(v) => v }
          (res, outBindings.map { case (pn, _) => argScope(pn.toLowerCase).value })
        } finally {
          scopes = savedScopes; currentPkg = savedPkg; returnCursorBuf = savedBuf
          if (myBuf.nonEmpty)
            resultSets(name.toLowerCase) = mutable.Queue(myBuf.toSeq: _*)
        }
      outBindings.lazyZip(outVals).foreach { case ((_, callerVar), v) => setVar(callerVar, v) }
      result
    }

    // ---- SQL rendering ------------------------------------------------------

    /** Rebuild SQL text from captured tokens, substituting declared
      * variables as literals (the reference substitutes identifiers that
      * resolve to variables — Exec.java). An identifier is substituted
      * only when it is not a function call and not a qualified name part. */
    private def renderSql(tokens: Seq[Token]): String = {
      val sb = new StringBuilder
      for (i <- tokens.indices) {
        val t = tokens(i)
        val prev = if (i > 0) tokens(i - 1) else Token(Tok.Op, "", 0)
        val next = if (i + 1 < tokens.length) tokens(i + 1) else Token(Tok.EOF, "", 0)
        val piece = t.kind match {
          case Tok.Str => "'" + t.text.replace("'", "''") + "'"
          case Tok.QIdent => "`" + t.text + "`" // delimited: re-quote, never substitute
          case Tok.Ident
            if prev.text != "." && next.text != "(" && next.text != "." && findVar(t.text).isDefined =>
            literal(findVar(t.text).get.value)
          case _ => t.text
        }
        if (sb.nonEmpty && piece != "," && piece != ")" && piece != "." &&
            sb.last != '(' && sb.last != '.') sb.append(' ')
        sb.append(piece)
      }
      sb.toString
    }

    /** Substitute `:name` and bare declared names in a dynamic SQL string. */
    private def substituteVars(sql: String): String = renderSql(Lexer.lex(sql).dropRight(1))

    private def literal(v: Any): String = v match {
      case null              => "NULL"
      case s: String         => "'" + s.replace("'", "''") + "'"
      case d: LocalDate      => s"DATE '${d}'"
      case t: LocalDateTime  => s"TIMESTAMP '${renderTs(t)}'"
      case ts: TsC           => s"TIMESTAMP '${renderTsC(ts)}'"
      case b: Boolean        => if (b) "true" else "false"
      case n: BigDecimal     => n.bigDecimal.toPlainString
      case other             => other.toString
    }

    // ---- expressions --------------------------------------------------------

    private def evalCatchingZeroDivide(e: Expr): (Any, Option[HplError]) =
      try (eval(e), None)
      catch { case err @ HplError("ZERO_DIVIDE", _) => (null, Some(err)) }

    def eval(e: Expr): Any = e match {
      case NumLit(v)  => v
      case StrLit(v)  => v
      case BoolLit(v) => v
      case NullLit    => null
      case DateLit(s) => LocalDate.parse(s.trim.take(10))
      case TimestampLit(s) =>
        val t = parseTs(s)
        if (!tsCompat) t
        else {
          // scale from the literal text (visitTimestamp_literal: chars
          // past position 19, capped at 3); value truncated to millis,
          // the resolution every reference timestamp op runs at
          val raw = s.trim
          val scale = if (raw.length > 19) math.min(raw.length - 20, 3) else 0
          TsC(t.withNano(t.getNano / 1000000 * 1000000), scale)
        }
      case VarRef(name) =>
        findVar(name) match {
          case Some(v) => v.value
          case None =>
            name.toUpperCase match {
              case "CURRENT_DATE" | "SYSDATE" | "CURRENT_TIMESTAMP" | "NOW" =>
                evalBuiltin(name.toUpperCase, Nil)
              case "HOSTCODE" | "SQLCODE" | "ERRORCODE" => BigDecimal(0)
              case "SQLSTATE" => "00000"
              // reference Exec.visitIdent:2124: an undefined identifier
              // becomes a NULL-valued IDENT var (name only, no value) —
              // `'j: ' || j` prints "j: " (operatorConcat skips nulls),
              // never an error (var_scope.sql replay pins this)
              case _ => null
            }
        }
      case FieldRef(rec, field) =>
        findVar(rec).map(_.value) match {
          case Some(r: Rec) => r.get(field)
          case other =>
            // package variable access: pkg.var
            packages.get(rec.toLowerCase).flatMap(_.scope.get(field.toLowerCase)) match {
              case Some(v) => v.value
              case None => other match {
                case Some(null) | None =>
                  throw HplError("UNDEFINED", s"Record or package not found: $rec")
                case Some(x) => throw HplError("UNDEFINED", s"Not a record: $rec = $x")
              }
            }
        }
      case CursorAttr(name, attr) =>
        cursorRef(name) match {
          case Some(c) => attr match {
            case "ISOPEN"   => c.open
            case "FOUND"    => c.found.orNull
            case "NOTFOUND" => c.found.map(!_).orNull
            case "ROWCOUNT" => null
          }
          case None if findVar(name).isDefined => // unopened refcursor variable
            if (attr == "ISOPEN") false else null
          case None => throw HplError("UNDEFINED", s"Cursor not found: $name")
        }
      case Un("NOT", x) =>
        eval(x) match { case null => null; case b => !truthy(b) }
      case Un("-", x) =>
        eval(x) match {
          case null => null
          case n: BigDecimal => -n
          case other => -toNum(other)
        }
      case Un(op, _) => throw HplError("UNDEFINED", s"Unknown unary op $op")
      case Bin(op, l, r) => binop(op, l, r)
      case IsNull(x, neg) =>
        val isNull = eval(x) == null
        if (neg) !isNull else isNull
      case Between(x, lo, hi, neg) =>
        val v = eval(x)
        val lv = eval(lo)
        val hv = eval(hi)
        // three-valued logic like =/IN/LIKE: a NULL bound yields NULL,
        // never an UNDEFINED error from comparing against null
        if (v == null || lv == null || hv == null) null
        else {
          val b = cmp(v, lv) >= 0 && cmp(v, hv) <= 0
          if (neg) !b else b
        }
      case InList(x, items, neg) =>
        val v = eval(x)
        if (v == null) null
        else {
          val b = items.exists(i => { val iv = eval(i); iv != null && cmp(v, iv) == 0 })
          if (neg) !b else b
        }
      case LikeE(x, pat, neg) =>
        (eval(x), eval(pat)) match {
          case (null, _) | (_, null) => null
          case (s, p) =>
            val rx = java.util.regex.Pattern.quote(p.toString)
              .replace("%", "\\E.*\\Q").replace("_", "\\E.\\Q")
            val b = s.toString.matches(rx)
            if (neg) !b else b
        }
      case FnCall(name, args) =>
        if (resolveRoutine(name).isDefined) callRoutine(name, args)
        else evalBuiltin(name, args)
      case CaseE(subject, whens, els) =>
        subject match {
          case Some(sub) =>
            val sv = eval(sub)
            whens.find { case (w, _) => sv != null && { val wv = eval(w); wv != null && cmp(sv, wv) == 0 } }
              .map(p => eval(p._2))
              .orElse(els.map(eval)).orNull
          case None =>
            whens.find(p => truthy(eval(p._1))).map(p => eval(p._2))
              .orElse(els.map(eval)).orNull
        }
      case CastE(x, dtype) => coerce(eval(x), dtype)
      case IntervalAdd(base, sign, nE, unit) =>
        val n = toLong(eval(nE)) * sign
        eval(base) match {
          case null => null
          case d: LocalDate =>
            unit match {
              case u if u.startsWith("DAY")   => d.plusDays(n)
              case u if u.startsWith("MONTH") => d.plusMonths(n)
              case u if u.startsWith("YEAR")  => d.plusYears(n)
              case _ => d.atStartOfDay().plus(intervalNanos(n, unit), java.time.temporal.ChronoUnit.NANOS)
            }
          case t: LocalDateTime =>
            unit match {
              case u if u.startsWith("DAY")   => t.plusDays(n)
              case u if u.startsWith("MONTH") => t.plusMonths(n)
              case u if u.startsWith("YEAR")  => t.plusYears(n)
              case u => t.plusNanos(intervalNanos(n, u))
            }
          case ts: TsC =>
            val t = ts.t
            val t2 = unit match {
              case u if u.startsWith("DAY")   => t.plusDays(n)
              case u if u.startsWith("MONTH") => t.plusMonths(n)
              case u if u.startsWith("YEAR")  => t.plusYears(n)
              // the reference quirk, reproduced: MICROSECOND intervals
              // land as milliseconds (Interval.set -> setMilliseconds)
              case u if u.startsWith("MICROSECOND") => t.plusNanos(n * 1000000L)
              case u => t.plusNanos(intervalNanos(n, u))
            }
            TsC(t2, ts.scale)
          case other => throw HplError("UNDEFINED", s"Interval arithmetic on $other")
        }
    }

    private def intervalNanos(n: Long, unit: String): Long = unit match {
      case u if u.startsWith("MICROSECOND") => n * 1000L
      case u if u.startsWith("SECOND")      => n * 1000000000L
      case u if u.startsWith("MINUTE")      => n * 60L * 1000000000L
      case u if u.startsWith("HOUR")        => n * 3600L * 1000000000L
      case _ => throw HplError("UNDEFINED", s"Unknown interval unit $unit")
    }

    private def binop(op: String, lE: Expr, rE: Expr): Any = op match {
      case "AND" =>
        val l = eval(lE)
        if (l != null && !truthy(l)) false
        else {
          val r = eval(rE)
          if (r != null && !truthy(r)) false
          else if (l == null || r == null) null
          else true
        }
      case "OR" =>
        val l = eval(lE)
        if (l != null && truthy(l)) true
        else {
          val r = eval(rE)
          if (r != null && truthy(r)) true
          else if (l == null || r == null) null
          else false
        }
      case "||" =>
        // Hive HPL/SQL concat skips NULLs only in CONCAT(); `||` is
        // null-propagating in the reference's Expression.operatorConcat?
        // — its concat() treats NULL as empty for || as well
        // (Expression.java evalConcat appends non-null parts).
        val l = eval(lE)
        val r = eval(rE)
        if (l == null && r == null) null
        else Option(l).map(render).getOrElse("") + Option(r).map(render).getOrElse("")
      case "=" | "<>" | "!=" | "<" | ">" | "<=" | ">=" =>
        val l = eval(lE)
        val r = eval(rE)
        if (l == null || r == null) null
        else {
          val c = cmp(l, r)
          op match {
            case "="          => c == 0
            case "<>" | "!="  => c != 0
            case "<"          => c < 0
            case ">"          => c > 0
            case "<="         => c <= 0
            case ">="         => c >= 0
          }
        }
      case "+" | "-" | "*" | "/" | "%" =>
        val l = eval(lE)
        val r = eval(rE)
        (l, r) match {
          case (null, _) | (_, null) => null
          case (d: LocalDate, n) if op == "+" => d.plusDays(toLong(n))
          case (n, d: LocalDate) if op == "+" => d.plusDays(toLong(n)) // 1 + DATE (add.sql)
          case (d: LocalDate, n) if op == "-" && !n.isInstanceOf[LocalDate] => d.minusDays(toLong(n))
          case (t: LocalDateTime, n) if op == "+" => t.plusDays(toLong(n))
          case (n, t: LocalDateTime) if op == "+" => t.plusDays(toLong(n))
          case (t: LocalDateTime, n) if op == "-" => t.minusDays(toLong(n))
          case (ts: TsC, n) if op == "+" => TsC(ts.t.plusDays(toLong(n)), ts.scale)
          case (n, ts: TsC) if op == "+" => TsC(ts.t.plusDays(toLong(n)), ts.scale)
          case (ts: TsC, n) if op == "-" => TsC(ts.t.minusDays(toLong(n)), ts.scale)
          case _ =>
            // `'a' + 'b'` / `cast(x as varchar2) + ' aa'` concatenate when a
            // side is non-numeric text (reference Expression.operatorAdd)
            val nums =
              try Some((toNum(l), toNum(r)))
              catch {
                case _: NumberFormatException | _: HplError
                  if op == "+" && (l.isInstanceOf[String] || r.isInstanceOf[String]) => None
              }
            if (nums.isEmpty) return render(l) + render(r)
            val (a, b) = nums.get
            op match {
              case "+" => a + b
              case "-" => a - b
              case "*" => a * b
              case "/" =>
                if (b.signum == 0) throw HplError("ZERO_DIVIDE", "divide by zero")
                else {
                  val q = a.bigDecimal.divide(b.bigDecimal, java.math.MathContext.DECIMAL64)
                  BigDecimal(q.stripTrailingZeros)
                }
              case "%" =>
                if (b.signum == 0) throw HplError("ZERO_DIVIDE", "divide by zero")
                else a % b
            }
        }
      case other => throw HplError("UNDEFINED", s"Unknown operator $other")
    }

    // ---- builtin scalar functions ------------------------------------------

    private def str(a: Any): String = if (a == null) null else render(a)

    private def evalBuiltin(name: String, argEs: Seq[Expr]): Any = {
      lazy val args = argEs.map(eval)
      name match {
        case "NVL" | "IFNULL" | "ISNULL" => args.find(_ != null).orNull
        case "COALESCE" => args.find(_ != null).orNull
        case "NVL2" => if (args(0) != null) args(1) else args(2)
        case "DECODE" =>
          val subject = args.head
          val pairs = args.tail.grouped(2).toSeq
          pairs.collectFirst {
            case Seq(w, r) if (subject == null && w == null) ||
              (subject != null && w != null && cmp(subject, w) == 0) => r
          }.orElse(pairs.collectFirst { case Seq(d) => d }).orNull
        case "CONCAT" => // null-skipping (reference FunctionString.concat)
          val parts = args.filter(_ != null)
          if (parts.isEmpty) null else parts.map(render).mkString
        case "LENGTH" => Option(str(args.head)).map(s => BigDecimal(s.length)).orNull
        case "LEN" => Option(str(args.head)) // T-SQL: trailing blanks excluded
          .map(s => BigDecimal(s.reverse.dropWhile(_ == ' ').length)).orNull
        case "LOWER" | "LCASE" => Option(str(args.head)).map(_.toLowerCase).orNull
        case "UPPER" | "UCASE" => Option(str(args.head)).map(_.toUpperCase).orNull
        case "TRIM"  => Option(str(args.head)).map(_.trim).orNull
        case "LTRIM" => Option(str(args.head)).map(_.dropWhile(_ == ' ')).orNull
        case "RTRIM" => Option(str(args.head)).map(_.reverse.dropWhile(_ == ' ').reverse).orNull
        case "SUBSTR" | "SUBSTRING" =>
          val s = str(args.head)
          if (s == null) null
          else {
            val start0 = toLong(args(1)).toInt
            val start = if (start0 > 0) start0 - 1 else if (start0 < 0) s.length + start0 else 0
            val from = math.max(0, math.min(s.length, start))
            val until = args.lift(2).map(l => math.min(s.length, from + toLong(l).toInt)).getOrElse(s.length)
            s.substring(from, math.max(from, until))
          }
        case "INSTR" =>
          // Oracle semantics incl. negative position + occurrence
          // (reference FunctionString.instr; instr.sql pins all five forms)
          val s = str(args.head)
          if (s == null) null
          else {
            val sub = str(args(1))
            val pos = args.lift(2).map(toLong(_).toInt).getOrElse(1)
            val occ = args.lift(3).map(toLong(_).toInt).getOrElse(1)
            var result = 0
            if (pos >= 0) {
              var from = pos - 1
              var remaining = occ
              var idx = -1
              while (remaining > 0 && { idx = s.indexOf(sub, from); idx >= 0 }) {
                remaining -= 1
                from = idx + 1
              }
              result = if (remaining == 0 && idx >= 0) idx + 1 else 0
            } else {
              var from = s.length + pos
              var remaining = occ
              var idx = -1
              while (remaining > 0 && { idx = s.lastIndexOf(sub, from); idx >= 0 }) {
                remaining -= 1
                from = idx - 1
              }
              result = if (remaining == 0 && idx >= 0) idx + 1 else 0
            }
            BigDecimal(result)
          }
        case "REPLACE" => Option(str(args.head)).map(_.replace(str(args(1)), str(args(2)))).orNull
        case "ABS" => Option(args.head).map(v => toNum(v).abs).orNull
        case "MOD" => if (args.contains(null)) null else toNum(args(0)) % toNum(args(1))
        case "POWER" => if (args.contains(null)) null
          else BigDecimal(math.pow(toNum(args(0)).toDouble, toNum(args(1)).toDouble))
        case "CURRENT_DATE" | "SYSDATE" | "TODAY" => LocalDate.now()
        case "CURRENT_TIMESTAMP" | "NOW" | "GETDATE" => LocalDateTime.now()
        case "TO_CHAR" | "CHAR" => Option(args.head).map(render).orNull
        case "TO_NUMBER" => Option(args.head).map(toNum).orNull
        case "CAST" => args.head
        // general cmp, not toNum: GREATEST('abc','abd') compares as
        // strings exactly like the engine fallback would
        case "GREATEST" =>
          args.filter(_ != null).reduceOption((a, b) => if (cmp(a, b) >= 0) a else b).orNull
        case "LEAST" =>
          args.filter(_ != null).reduceOption((a, b) => if (cmp(a, b) <= 0) a else b).orNull
        case "TIMESTAMP_ISO" => Option(args.head).map(v => parseTs(render(v))).orNull
        case "TO_TIMESTAMP" =>
          // Oracle-style patterns, case-insensitive (reference
          // FunctionDatetime.toTimestamp: YYYY/MM/DD/HH24/MI/SS via
          // SimpleDateFormat after upper-normalization) — translated to
          // java.time tokens; missing time fields default to midnight
          if (args.take(2).contains(null)) null
          else {
            val pat = str(args(1)).toUpperCase
              .replace("HH24", "HH").replace("HH12", "hh")
              .replace("YYYY", "uuuu").replace("YY", "uu")
              .replace("DD", "dd").replace("MI", "m~")
              .replace("MM", "MM").replace("SS", "ss")
              .replace("m~", "mm")
            val fmt = new java.time.format.DateTimeFormatterBuilder()
              .parseCaseInsensitive().appendPattern(pat)
              .parseDefaulting(java.time.temporal.ChronoField.HOUR_OF_DAY, 0)
              .parseDefaulting(java.time.temporal.ChronoField.MINUTE_OF_HOUR, 0)
              .parseDefaulting(java.time.temporal.ChronoField.SECOND_OF_MINUTE, 0)
              .toFormatter()
            LocalDateTime.from(fmt.parse(str(args.head)))
          }
        case "DATE" => Option(args.head).map(v => LocalDate.parse(render(v).take(10))).orNull
        case "PRINT" => emit(Option(args.head).map(render).getOrElse("")); null
        case _ =>
          // whole-engine scalar surface: one-row SELECT against Spark
          val rendered = argEs.map(a => literal(eval(a))).mkString(", ")
          try {
            val row = runSql(s"SELECT $name($rendered) AS v").collect()(0)
            fromSpark(row.get(0))
          } catch {
            case e: HplError => throw e
            case e: Exception => throw HplError("SQLEXCEPTION",
              s"Function not found or failed: $name (${e.getMessage})")
          }
      }
    }

    // ---- value model --------------------------------------------------------

    private def truthy(v: Any): Boolean = v match {
      case null => false
      case b: Boolean => b
      case n: BigDecimal => n.signum != 0
      case s: String => s.equalsIgnoreCase("true") || s == "1"
      case _ => true
    }

    private def toNum(v: Any): BigDecimal = v match {
      case n: BigDecimal => n
      case b: Boolean => if (b) BigDecimal(1) else BigDecimal(0)
      case s: String =>
        try BigDecimal(s.trim)
        catch { case _: NumberFormatException =>
          throw HplError("CONVERSION", s"Not a number: '$s'") }
      case l: Long => BigDecimal(l)
      case i: Int => BigDecimal(i)
      case d: Double => BigDecimal(d)
      case other => throw HplError("UNDEFINED", s"Not a number: $other")
    }

    private def toLong(v: Any): Long = toNum(v).toLong

    private def cmp(l0: Any, r0: Any): Int = {
      // compat timestamps compare by instant (the reference compares the
      // underlying Timestamp; scale is display-only)
      def unwrapTs(v: Any): Any = v match { case ts: TsC => ts.t; case x => x }
      val (l, r) = (unwrapTs(l0), unwrapTs(r0))
      cmpUnwrapped(l, r)
    }

    private def cmpUnwrapped(l: Any, r: Any): Int = (l, r) match {
      // number vs string: numeric when the string parses, else string
      // comparison (the reference's Var.compareTo coercion order)
      case (a: BigDecimal, b) =>
        try a.compare(toNum(b))
        catch { case HplError("CONVERSION", _) => render(a).compareTo(render(b)) }
      case (a, b: BigDecimal) =>
        try toNum(a).compare(b)
        catch { case HplError("CONVERSION", _) => render(a).compareTo(render(b)) }
      case (a: LocalDate, b: LocalDate) => a.compareTo(b)
      case (a: LocalDateTime, b: LocalDateTime) => a.compareTo(b)
      case (a: LocalDate, b: LocalDateTime) => a.atStartOfDay.compareTo(b)
      case (a: LocalDateTime, b: LocalDate) => a.compareTo(b.atStartOfDay)
      case (a: LocalDate, b: String) => a.toString.compareTo(b)
      case (a: String, b: LocalDate) => a.compareTo(b.toString)
      case (a: Boolean, b: Boolean) => a.compareTo(b)
      case (a, b) => render(a).compareTo(render(b))
    }

    private def coerce(v: Any, dtype: String): Any = {
      if (v == null) return null
      val t = dtype.takeWhile(_ != '(')
      t match {
        case "INT" | "INTEGER" | "BIGINT" | "SMALLINT" | "TINYINT" =>
          BigDecimal(toNum(v).toLong)
        case "DECIMAL" | "DEC" | "NUMBER" | "NUMERIC" | "FLOAT" | "REAL" | "DOUBLE" => toNum(v)
        case "STRING" | "TEXT" | "CHAR" | "VARCHAR" | "VARCHAR2" =>
          // CHAR(n)/VARCHAR(n) truncate (cast.out.txt: CAST('Abc' AS CHAR(1)) = 'A')
          val s = render(v)
          val len = dtype.dropWhile(_ != '(').drop(1).takeWhile(_.isDigit)
          if (len.nonEmpty) s.take(len.toInt) else s
        case "DATE" => v match {
          case d: LocalDate => d
          case t2: LocalDateTime => t2.toLocalDate
          case ts: TsC => ts.t.toLocalDate
          case s => LocalDate.parse(render(s).take(10))
        }
        case "TIMESTAMP" | "DATETIME" => v match {
          case t2: LocalDateTime => t2
          case ts: TsC => ts
          case d: LocalDate => d.atStartOfDay
          case s => parseTs(render(s))
        }
        case "BOOLEAN" | "BOOL" => truthy(v)
        case _ => v
      }
    }

    private def fromSpark(v: Any): Any = v match {
      case null => null
      case s: String => s
      case i: Int => BigDecimal(i)
      case l: Long => BigDecimal(l)
      case s: Short => BigDecimal(s.toInt)
      case b: Byte => BigDecimal(b.toInt)
      case d: Double =>
        // BigDecimal(NaN/Inf) throws raw NumberFormatException, which no
        // WHEN OTHERS handler could catch — raise the catchable form
        if (d.isNaN || d.isInfinite)
          throw HplError("CONVERSION", s"non-finite double from SQL: $d")
        // SQL-sourced values carry no author-chosen scale — normalize
        // (1e2 prints 102, DECIMAL(18,2) 1.10 prints 1.1); interpreter
        // LITERALS keep their written scale (lang.out.txt prints 1.0)
        BigDecimal(java.math.BigDecimal.valueOf(d).stripTrailingZeros())
      case f: Float =>
        if (f.isNaN || f.isInfinite)
          throw HplError("CONVERSION", s"non-finite float from SQL: $f")
        BigDecimal(java.math.BigDecimal.valueOf(f.toDouble).stripTrailingZeros())
      case d: java.math.BigDecimal => BigDecimal(d.stripTrailingZeros)
      case d: java.sql.Date => d.toLocalDate
      case t: java.sql.Timestamp => t.toLocalDateTime
      case t: java.time.Instant => LocalDateTime.ofInstant(t, java.time.ZoneOffset.UTC)
      case t: LocalDateTime => t
      case d: LocalDate => d
      case b: Boolean => b
      case other => other.toString
    }

    private def parseTs(s: String): LocalDateTime = {
      val t0 = s.trim
      // DB2 spelling YYYY-MM-DD-HH.MI.SS[.FFF] (Utils.toTimestamp:118
      // rewrites it to the standard form the same way)
      val t = if (t0.length > 19 && t0.charAt(10) == '-')
        t0.substring(0, 10) + ' ' + t0.substring(11, 13) + ':' +
          t0.substring(14, 16) + ':' + t0.substring(17)
      else t0
      if (t.length <= 10) LocalDate.parse(t).atStartOfDay
      else LocalDateTime.parse(t.replace(' ', 'T'))
    }

    /** Reference-compat timestamp value, active only under
      * `graft.hplsql.compat.tsMillis`: the reference stores timestamps
      * at MILLISECOND resolution (Interval.java:45 timestampChange runs
      * through Calendar millis), maps MICROSECOND intervals onto
      * milliseconds (Interval.java:76-80 — set() calls
      * setMilliseconds, a quirk this mode reproduces faithfully), and
      * renders by cutting Timestamp.toString at 19 + scale + 1 chars,
      * scale being the LITERAL's fraction width capped at 3
      * (Var.toString + Exec.visitTimestamp_literal). Default mode keeps
      * true microseconds (HplsqlSpec pins `.000001`), so the wrapper
      * never appears unless the conf opts a script into compat. */
    private final case class TsC(t: LocalDateTime, scale: Int)

    private def tsCompat: Boolean =
      spark.conf.getOption("graft.hplsql.compat.tsMillis").contains("true")

    private def renderTsC(ts: TsC): String = {
      val s = java.sql.Timestamp.valueOf(ts.t).toString // carries >= ".0"
      val len = 19 + (if (ts.scale > 0) ts.scale + 1 else 0)
      if (s.length > len) s.substring(0, len) else s
    }

    private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    private def renderTs(t: LocalDateTime): String = {
      val base = t.format(tsFmt)
      if (t.getNano == 0) base
      else {
        val frac = f"${t.getNano}%09d".reverse.dropWhile(_ == '0').reverse
        s"$base.$frac"
      }
    }

    def render(v: Any): String = v match {
      case null => "null"
      case s: String => s
      case n: BigDecimal =>
        // scale is part of the value (the reference's DECIMAL Var prints
        // `1.0` for the literal 1.0 — lang.out.txt); only scientific
        // notation normalizes away. Division strips its own result, so
        // 8/4/2 still prints 1, not 1.00.
        (if (n.bigDecimal.scale < 0) n.bigDecimal.setScale(0) else n.bigDecimal).toPlainString
      case d: LocalDate => d.toString
      case t: LocalDateTime => renderTs(t)
      case ts: TsC => renderTsC(ts)
      case b: Boolean => if (b) "true" else "false"
      case r: Rec => r.fields.map(f => render(f._2)).mkString(", ")
      case other => other.toString
    }
  }
}
