package graft.hplsql

import scala.collection.mutable.ArrayBuffer

import Ast._

/** Hand-written lexer for HPL/SQL scripts.
  *
  * Token shapes follow the reference grammar's lexer rules
  * (hplsql/src/main/antlr4/org/apache/hive/hplsql/Hplsql.g4: L_ID /
  * L_S_STRING / L_D_STRING / L_INT / L_DEC, `--` and C-style comments,
  * `<<label>>`, the `..` range operator). `1..10` lexes as
  * NUM(1) .. NUM(10), never NUM(1.): a dot that is immediately followed
  * by another dot terminates the number.
  */
private[hplsql] object Lexer {
  def lex(src: String): Vector[Token] = {
    val out = ArrayBuffer.empty[Token]
    var i = 0
    var line = 1
    val n = src.length
    def peek(k: Int = 0): Char = if (i + k < n) src.charAt(i + k) else '\u0000'
    while (i < n) {
      val c = src.charAt(i)
      if (c == '\n') { line += 1; i += 1 }
      else if (c.isWhitespace) i += 1
      else if (c == '-' && peek(1) == '-') { while (i < n && src.charAt(i) != '\n') i += 1 }
      else if (c == '/' && peek(1) == '*') {
        i += 2
        while (i + 1 < n && !(src.charAt(i) == '*' && src.charAt(i + 1) == '/')) {
          if (src.charAt(i) == '\n') line += 1; i += 1
        }
        i = math.min(n, i + 2)
      } else if (c == '\'') {
        val sb = new StringBuilder
        i += 1
        var done = false
        while (i < n && !done) {
          val ch = src.charAt(i)
          if (ch == '\'' && peek(1) == '\'') { sb.append('\''); i += 2 }
          else if (ch == '\\' && peek(1) == '\'') { sb.append('\''); i += 2 }
          else if (ch == '\'') { done = true; i += 1 }
          else { if (ch == '\n') line += 1; sb.append(ch); i += 1 }
        }
        out += Token(Tok.Str, sb.toString, line)
      } else if (c == '"' || c == '`' || c == '[') {
        // DELIMITED identifier: keep its quoted-ness (QIdent) so renderSql
        // re-quotes it for Spark, variable substitution skips it, and a
        // quoted keyword (`end`, `select`) can never derail parsing
        val close = if (c == '[') ']' else c
        val sb = new StringBuilder
        i += 1
        while (i < n && src.charAt(i) != close) { sb.append(src.charAt(i)); i += 1 }
        i += 1
        out += Token(Tok.QIdent, sb.toString, line)
      } else if (c.isDigit || (c == '.' && peek(1).isDigit)) {
        val sb = new StringBuilder
        var seenDot = false
        var stop = false
        var seenExp = false
        while (i < n && !stop) {
          val ch = src.charAt(i)
          if (ch.isDigit) { sb.append(ch); i += 1 }
          else if (ch == '.' && !seenDot && !seenExp && peek(1) != '.') { seenDot = true; sb.append(ch); i += 1 }
          else if ((ch == 'e' || ch == 'E') && !seenExp &&
                   (peek(1).isDigit ||
                    ((peek(1) == '+' || peek(1) == '-') && peek(2).isDigit))) {
            // scientific notation: 1e6 / 1.5E-3 is ONE literal — split
            // tokens would render as "1 e6" (an alias) in passthrough SQL
            seenExp = true; sb.append(ch); i += 1
            if (!src.charAt(i).isDigit) { sb.append(src.charAt(i)); i += 1 }
          }
          else stop = true
        }
        out += Token(Tok.Num, sb.toString, line)
      } else if (c.isLetter || c == '_' || c == '@' || c == '#' || c == '$' || c == ':' && peek(1).isLetter) {
        // ':new.abc'-style host prefixes fold into the identifier
        val sb = new StringBuilder
        sb.append(c); i += 1
        while (i < n && (peek().isLetterOrDigit || peek() == '_' || peek() == '#' || peek() == '$')) {
          sb.append(src.charAt(i)); i += 1
        }
        out += Token(Tok.Ident, sb.toString, line)
      } else {
        val two = if (i + 1 < n) src.substring(i, i + 2) else ""
        val op2 = Set("||", ":=", "<>", "!=", "<=", ">=", "==", "..", "<<", ">>")
        if (op2.contains(two)) { out += Token(Tok.Op, two, line); i += 2 }
        else { out += Token(Tok.Op, c.toString, line); i += 1 }
      }
    }
    out += Token(Tok.EOF, "", line)
    out.toVector
  }
}

/** Thrown to callers on malformed scripts — public API surface. */
final class ParseError(msg: String) extends RuntimeException(msg)

/** Recursive-descent parser producing the Ast.Stmt tree.
  *
  * Covers the statement families the reference's own test corpus
  * exercises (hplsql/src/test/queries/local + db): PL/SQL *and* T-SQL
  * forms of IF/WHILE, the three loop-exit spellings, range and cursor
  * FOR loops, DECLARE blocks, procedures/functions with IN/OUT params,
  * EXCEPTION blocks, SELECT INTO / EXECUTE INTO / VALUES INTO, and a
  * raw-SQL passthrough for everything set-based.
  */
private[hplsql] final class Parser(tokens: Vector[Token]) {
  private var p = 0

  private def cur: Token = tokens(p)
  private def la(k: Int): Token = tokens(math.min(tokens.length - 1, p + k))
  private def advance(): Token = { val t = cur; p += 1; t }
  private def expectOp(op: String): Unit =
    if (cur.kind == Tok.Op && cur.text == op) p += 1
    else throw new ParseError(s"line ${cur.line}: expected '$op', found '${cur.text}'")
  private def expectKw(kw: String): Unit =
    if (cur.is(kw)) p += 1
    else throw new ParseError(s"line ${cur.line}: expected $kw, found '${cur.text}'")
  private def atOp(op: String): Boolean = cur.kind == Tok.Op && cur.text == op
  private def eatOp(op: String): Boolean = { val b = atOp(op); if (b) p += 1; b }
  private def eatKw(kw: String): Boolean = { val b = cur.is(kw); if (b) p += 1; b }
  private def eatSemi(): Unit = { while (atOp(";")) p += 1 }

  private val typeNames = Set("CHAR", "VARCHAR", "VARCHAR2", "STRING", "TEXT", "INT", "INTEGER",
    "BIGINT", "SMALLINT", "TINYINT", "INT2", "INT4", "INT8", "DECIMAL", "DEC", "NUMBER",
    "NUMERIC", "FLOAT", "REAL", "DOUBLE", "DATE", "DATETIME", "TIMESTAMP", "BOOLEAN", "BOOL",
    "BINARY", "SYS_REFCURSOR")

  /** Leading keywords of set-based statements that must stay passthrough
    * even when followed by '(' (none realistically are, but be safe). */
  private val sqlLeading = Set("INSERT", "UPDATE", "DELETE", "MERGE", "TRUNCATE", "DROP",
    "ALTER", "USE", "SHOW", "DESCRIBE", "DESC", "ANALYZE", "CACHE", "UNCACHE", "MSCK",
    "EXPORT", "IMPORT", "LOAD", "REFRESH", "TABLE", "GRANT", "REVOKE")

  private val stmtStarters = Set("DECLARE", "SET", "PRINT", "IF", "WHILE", "FOR", "EXIT",
    "BREAK", "LEAVE", "OPEN", "FETCH", "CLOSE", "RETURN", "CALL", "EXEC", "EXECUTE",
    "CREATE", "BEGIN", "END", "ELSE", "ELSIF", "ELSEIF", "WHEN", "EXCEPTION", "VALUES",
    "PRINTLN", "NULL", "HOST", "SIGNAL", "INCLUDE", "DBMS_OUTPUT")

  def parseProgram(): Seq[Stmt] = {
    val out = ArrayBuffer.empty[Stmt]
    eatSemi()
    while (cur.kind != Tok.EOF) {
      out += parseStmt()
      eatSemi()
    }
    out.toSeq
  }

  private def at(kw: String): Boolean = cur.is(kw)
  private def atSemiNext: Boolean = la(1).kind == Tok.Op && la(1).text == ";"

  private def mark[T <: Stmt](s: T, ln: Int): T = { s.line = ln; s }

  private def parseStmt(): Stmt = {
    val ln = cur.line
    // <<label>> or `label:` prefixes a loop (or a block — label ignored)
    if (atOp("<<") ||
        (cur.kind == Tok.Ident && la(1).kind == Tok.Op && la(1).text == ":" &&
         (la(2).is("WHILE") || la(2).is("FOR") || la(2).is("BEGIN") || la(2).is("LOOP")))) {
      val label =
        if (atOp("<<")) { advance(); val l = advance().text; expectOp(">>"); l }
        else { val l = advance().text; advance(); l }
      return parseStmt() match {
        case w: WhileS    => mark(w.copy(label = Some(label)), ln)
        case f: ForRange  => mark(f.copy(label = Some(label)), ln)
        case f: ForCursor => mark(f.copy(label = Some(label)), ln)
        case other        => other
      }
    }
    if (at("DECLARE")) return parseDeclare(ln)
    if (at("SET")) return parseSet(ln)
    if (at("PRINT") || at("PRINTLN")) {
      advance()
      if (atOp(";") || cur.kind == Tok.EOF) return mark(Print(None), ln)
      return mark(Print(Some(parseExpr())), ln)
    }
    if (at("DBMS_OUTPUT")) { // DBMS_OUTPUT.PUT_LINE(expr)
      advance(); expectOp("."); advance(); expectOp("(")
      val e = parseExpr(); expectOp(")")
      return mark(Print(Some(e)), ln)
    }
    if (at("IF")) return parseIf(ln)
    if (at("WHILE")) return parseWhile(ln, None)
    if (at("FOR")) return parseFor(ln, None)
    if (at("EXIT")) {
      advance()
      val label = if (cur.kind == Tok.Ident && !cur.is("WHEN") && !stmtStarters.contains(cur.up))
        Some(advance().text) else None
      val when = if (eatKw("WHEN")) Some(parseExpr()) else None
      return mark(ExitS(label, when), ln)
    }
    if (at("BREAK")) { advance(); return mark(ExitS(None, None), ln) }
    if (at("LEAVE")) {
      advance()
      val label = if (cur.kind == Tok.Ident && !stmtStarters.contains(cur.up)) Some(advance().text) else None
      return mark(ExitS(label, None), ln)
    }
    if (at("OPEN")) {
      advance()
      val name = advance().text
      val forSql = if (eatKw("FOR")) Some(captureSqlTokens()) else None
      return mark(OpenCur(name, forSql), ln)
    }
    if (at("FETCH")) {
      advance(); eatKw("FROM")
      val name = advance().text
      expectKw("INTO")
      val into = ArrayBuffer(advance().text)
      while (eatOp(",")) into += advance().text
      return mark(FetchCur(name, into.toSeq), ln)
    }
    if (at("CLOSE")) { advance(); return mark(CloseCur(advance().text), ln) }
    if (at("RETURN")) {
      advance()
      if (atOp(";") || cur.kind == Tok.EOF || cur.is("END")) return mark(ReturnS(None), ln)
      return mark(ReturnS(Some(parseExpr())), ln)
    }
    if (at("CALL")) {
      advance()
      val sb = new StringBuilder(advance().text)
      while (atOp(".")) { advance(); sb.append('.').append(advance().text) }
      val args = if (eatOp("(")) parseArgs() else Nil
      return mark(CallProc(sb.toString, args), ln)
    }
    if (at("EXEC") || at("EXECUTE")) return parseExec(ln)
    if (at("CREATE") && (la(1).is("PROCEDURE") || la(1).is("PROC") || la(1).is("FUNCTION") ||
        (la(1).is("OR") && la(2).is("REPLACE") && (la(3).is("PROCEDURE") || la(3).is("PROC") || la(3).is("FUNCTION"))))) {
      // CREATE [OR REPLACE] FUNCTION name AS '<classname>' is compiled-UDF
      // deployment DDL (FunctionSemanticAnalyzer), not a procedural
      // routine: AS is followed by a string literal, never a body
      val base = if (la(1).is("OR")) 3 else 1
      val compiledUdf = la(base).is("FUNCTION") &&
        la(base + 2).is("AS") && la(base + 3).kind == Tok.Str
      if (!compiledUdf) return parseCreateRoutine(ln)
      return parsePassthrough(ln)
    }
    if (at("CREATE") && (la(1).is("PACKAGE") ||
        (la(1).is("OR") && la(2).is("REPLACE") && la(3).is("PACKAGE"))))
      return parseCreatePackage(ln)
    if (at("INCLUDE")) {
      // the reference's include_stmt is LINE-scoped (no semicolon
      // needed): capture only tokens on the INCLUDE's own line, or up
      // to an explicit semicolon — otherwise a bare `include path`
      // swallows the next statement
      advance()
      val toks = scala.collection.mutable.ArrayBuffer.empty[Token]
      while (cur.kind != Tok.EOF && cur.line == ln && !atOp(";")) toks += advance()
      eatSemi()
      return mark(IncludeS(toks.toSeq), ln)
    }
    if (at("BEGIN") && (la(1).is("TRANSACTION") || la(1).is("TRAN") || la(1).is("WORK"))) {
      // T-SQL BEGIN TRANSACTION: a no-op against an autocommit engine
      // (reference grammar's begin_transaction_stmt), NOT a block open —
      // treating it as one would swallow the rest of the script
      advance(); advance()
      return mark(NullS, ln)
    }
    if (at("BEGIN")) return parseBeginBlock(ln, Nil)
    if (at("VALUES")) return parseValuesInto(ln)
    if (at("NULL")) { advance(); return mark(NullS, ln) }
    // COMMIT/ROLLBACK are no-ops against an autocommit engine (the
    // reference's Stmt.java does the same for Hive connections)
    if (at("COMMIT") || at("ROLLBACK")) { advance(); eatKw("WORK"); return mark(NullS, ln) }
    if (at("HOST")) { advance(); return mark(HostCmd(parseExpr()), ln) }
    // Teradata BTEQ dot-commands (reference grammar's if_bteq_stmt /
    // quit_stmt; if3_bteq.sql): `.if cond then <stmt>` runs one statement,
    // `.quit [code]` leaves the whole script (LEAVE_PROGRAM — ReturnS at
    // top level is exactly that exit)
    if (atOp(".") && (la(1).is("IF") || la(1).is("QUIT"))) {
      advance() // '.'
      if (cur.is("QUIT")) {
        advance()
        val code = if (atOp(";") || cur.kind == Tok.EOF) None else Some(parseExpr())
        return mark(ReturnS(code), ln)
      }
      advance() // IF
      val cond = parseExpr()
      expectKw("THEN")
      return mark(IfS(Seq((cond, Seq(parseStmt()))), Nil), ln)
    }
    if (at("SIGNAL")) { advance(); return mark(SignalS(advance().text.toUpperCase), ln) }
    if (at("RAISE") && (atSemiNext || la(1).kind == Tok.EOF)) { advance(); return mark(RaiseS, ln) }
    if (at("FUNCTION") || at("PROCEDURE") || (at("PROC") && la(1).kind == Tok.Ident))
      return parseCreateRoutine(ln)
    if (at("ALLOCATE")) {
      advance()
      val name = advance().text
      expectKw("CURSOR"); expectKw("FOR")
      // DB2 two forms: `FOR PROCEDURE p` (direct) and
      // `FOR RESULT SET loc` (via an associated locator)
      if (eatKw("RESULT")) {
        expectKw("SET")
        return mark(AllocateCursorLoc(name, advance().text), ln)
      }
      expectKw("PROCEDURE")
      return mark(AllocateCursor(name, advance().text), ln)
    }
    if (at("ASSOCIATE")) {
      // ASSOCIATE RESULT SET LOCATOR (l1, l2) WITH PROCEDURE p — DB2's
      // binding of locator variables to a called procedure's returned
      // result sets, in order
      advance(); expectKw("RESULT"); expectKw("SET")
      eatKw("LOCATORS"); eatKw("LOCATOR")
      expectOp("(")
      val locs = ArrayBuffer(advance().text)
      while (eatOp(",")) locs += advance().text
      expectOp(")")
      expectKw("WITH"); expectKw("PROCEDURE")
      return mark(AssociateLocator(locs.toSeq, advance().text), ln)
    }
    if (at("COPY")) {
      advance()
      val src = captureCopySource()
      expectKw("TO")
      val hdfs = eatKw("HDFS")
      // target: tokens joined verbatim until an option keyword / ';'
      val tsb = new StringBuilder
      while (cur.kind != Tok.EOF && !atOp(";") &&
             !cur.is("DELIMITER") && !cur.is("SQLINSERT") && !cur.is("AT"))
        tsb.append(advance().text)
      var delim: Option[String] = None
      var sqlIns: Option[String] = None
      var more = true
      while (more) {
        if (eatKw("DELIMITER")) delim = Some(unescapeJava(advance().text))
        else if (eatKw("SQLINSERT")) sqlIns = Some(advance().text)
        else if (eatKw("AT")) advance() // second connection — single-engine here
        else more = false
      }
      val target = tsb.toString
      // a table target may be dotted (db.tbl) — only paths/extensions are files
      val toFile = hdfs || target.contains("/") ||
        target.matches("(?i).*\\.(txt|csv|tsv|dat|out)$")
      return mark(CopyS(src, target, toFile, delim, sqlIns), ln)
    }
    if (at("CMP")) {
      advance()
      val mode = advance().up // ROW_COUNT | SUM
      val left = captureCmpSource()
      expectOp(",")
      val right = captureCmpSource()
      if (eatKw("AT")) advance() // second-connection name — single-engine here
      return mark(CmpS(mode, left, right), ln)
    }
    // assignment without SET: ident := expr | ident = expr
    if (cur.kind == Tok.Ident && (la(1).text == ":=" || la(1).text == "=") && la(1).kind == Tok.Op) {
      val name = advance().text
      advance()
      return mark(Assign(Seq(name), Seq(parseExpr())), ln)
    }
    // SELECT possibly with INTO; any other leading keyword → raw passthrough
    if (at("SELECT") || at("WITH")) return parseSelectMaybeInto(ln)
    // bare / package-qualified routine call statements: f(..) / pkg.f(..)
    if (cur.kind == Tok.Ident && la(1).text == "." && la(2).kind == Tok.Ident &&
        la(3).text == "(" && !sqlLeading.contains(cur.up)) {
      val pkg = advance().text; advance(); val f = advance().text; advance()
      return mark(CallProc(s"$pkg.$f", parseArgs()), ln)
    }
    if (cur.kind == Tok.Ident && la(1).text == "(" && !sqlLeading.contains(cur.up) &&
        !at("CAST") && !at("CASE")) {
      val f = advance().text; advance()
      return mark(CallProc(f, parseArgs()), ln)
    }
    // bare expression statements led by literal/cast keywords (add.sql,
    // cast.sql, sub.sql: `DATE '2015-01-01' - 1;` prints its value)
    if ((at("DATE") || at("TIMESTAMP")) && la(1).kind == Tok.Str)
      return mark(ExprStmt(parseExpr()), ln)
    if (at("CAST") && la(1).text == "(")
      return mark(ExprStmt(parseExpr()), ln)
    // bare `sp1;` procedure-call statement (create_procedure_no_params.sql)
    if (cur.kind == Tok.Ident && (atSemiNext || la(1).kind == Tok.EOF) &&
        !sqlLeading.contains(cur.up))
      return mark(CallProc(advance().text, Nil), ln)
    if (cur.kind == Tok.Ident || cur.kind == Tok.QIdent) return parsePassthrough(ln)
    // bare expression statement (the reference's expr_stmt: `1 + 1;`)
    mark(ExprStmt(parseExpr()), ln)
  }

  // ---- DECLARE ------------------------------------------------------------

  private def parseDeclare(ln: Int): Stmt = {
    advance() // DECLARE
    val decls = ArrayBuffer.empty[Stmt]
    var more = true
    while (more) {
      decls += parseDeclItem()
      // `DECLARE a SMALLINT, b INT DEFAULT 100` — comma chains items
      if (atOp(",")) { advance() }
      // inside a DECLARE section, items are ';'-separated and a BEGIN ends it
      else if (atOp(";") && !la(1).is("BEGIN") && (la(1).kind == Tok.Ident && !stmtStarters.contains(la(1).up) || la(1).is("CURSOR"))) {
        // lookahead: another declaration item follows (ident ... type) — only
        // inside DECLARE..BEGIN blocks; a statement keyword ends the section
        val save = p
        p += 1
        val looksDecl = cur.is("CURSOR") ||
          (cur.kind == Tok.Ident && !stmtStarters.contains(cur.up) && declItemAhead())
        if (!looksDecl) { p = save; more = false }
      } else more = false
    }
    if (cur.is("BEGIN") || (atOp(";") && la(1).is("BEGIN"))) {
      eatSemi()
      parseBeginBlock(ln, decls.toSeq)
    } else if (decls.length == 1) mark(decls.head, ln)
    else mark(DeclGroup(decls.toSeq), ln)
  }

  /** After an ident, does a declaration item plausibly follow? (name list
    * then a type name, or a dotted package type, or %ROWTYPE). */
  private def declItemAhead(): Boolean = {
    var k = 1
    while (la(k).kind == Tok.Op && la(k).text == "," ) k += 2
    val t = la(k)
    t.kind == Tok.Ident && (typeNames.contains(t.up) || t.is("CONSTANT") ||
      la(k + 1).text == "." || la(k + 1).text == "%")
  }

  private def parseDeclItem(): Stmt = {
    val ln = cur.line
    if (eatKw("CURSOR")) {
      val name = advance().text
      val withReturn = if (eatKw("WITH")) { expectKw("RETURN"); true } else false
      if (!eatKw("IS")) eatKw("FOR")
      val sql = captureSqlTokens()
      return mark(DeclareCursor(name, sql, withReturn), ln)
    }
    if ((cur.is("EXIT") || cur.is("CONTINUE")) && la(1).is("HANDLER")) {
      val exit = cur.is("EXIT"); advance(); advance(); expectKw("FOR")
      val cond = advance().up
      val body = Seq(parseStmt())
      return mark(DeclareHandler(exit, cond, body), ln)
    }
    val names = ArrayBuffer(advance().text)
    // dotted variable names (lang.sql: `abc.abc`, `:new.abc`,
    // `"abc"."abc1"`, `[abc].[abc1]`): a dot DIRECTLY after a name is
    // always a name continuation — a dotted TYPE (UTL_FILE.FILE_TYPE)
    // dots its own first token, which sits one token after the name, so
    // folding unconditionally here can never eat a type (and a guarded
    // fold would derail `DECLARE a.b, c INT`, where ',' follows the part)
    def foldDots(): Unit =
      while (atOp(".") && (la(1).kind == Tok.Ident || la(1).kind == Tok.QIdent)) {
        advance()
        names(names.length - 1) = names.last + "." + advance().text
      }
    foldDots()
    if (cur.is("CONDITION")) { advance(); return mark(DeclareCondition(names.head), ln) }
    if (cur.is("CURSOR")) { // DB2 form: DECLARE name CURSOR [WITH RETURN] FOR sql
      advance()
      val withReturn = if (eatKw("WITH")) { expectKw("RETURN"); true } else false
      if (!eatKw("IS")) eatKw("FOR")
      return mark(DeclareCursor(names.head, captureSqlTokens(), withReturn), ln)
    }
    // collect names until a type token appears (each may be dotted too)
    while (atOp(",")) { advance(); names += advance().text; foldDots() }
    eatKw("CONSTANT") // `status constant int := 1` (declare2.sql)
    // type: possibly dotted (UTL_FILE.FILE_TYPE) or table%ROWTYPE
    val tsb = new StringBuilder(advance().up)
    while (atOp(".")) { advance(); tsb.append('.').append(advance().up) }
    if (atOp("%")) { advance(); tsb.append('%').append(advance().up) }
    if (eatOp("(")) { // length/scale
      tsb.append('(')
      while (!atOp(")")) tsb.append(advance().text)
      expectOp(")")
      tsb.append(')')
    }
    // multi-word type names: DOUBLE PRECISION (select_into2.sql),
    // RESULT_SET_LOCATOR VARYING (DB2 locator declarations)
    if (tsb.toString == "DOUBLE" && cur.is("PRECISION")) advance()
    if (tsb.toString == "RESULT_SET_LOCATOR" && cur.is("VARYING")) advance()
    if (eatKw("NOT")) expectKw("NULL") // `char(10) not null := 'a'` (declare2.sql)
    val init =
      if (eatKw("DEFAULT") || eatOp(":=") || eatOp("=")) Some(parseExpr()) else None
    mark(DeclareVar(names.toSeq, tsb.toString, init), ln)
  }

  // ---- SET ----------------------------------------------------------------

  private def parseSet(ln: Int): Stmt = {
    advance() // SET
    if (at("ROLE") && la(1).text != "=" && la(1).text != ",") {
      // SET ROLE r|ALL|NONE (HiveParser.g setRole) — session role
      // activation, not a variable assignment (a variable legitimately
      // NAMED role still assigns: `SET role = 5`); routed like the
      // other authorization DDL
      return mark(SqlPassthrough(
        Token(Tok.Ident, "SET", ln) +: captureSqlTokens()), ln)
    }
    if (atOp("(")) { // SET (a, b) = (e1, e2)
      advance()
      val names = ArrayBuffer(advance().text)
      while (eatOp(",")) names += advance().text
      expectOp(")")
      expectOp("=")
      expectOp("(")
      val vals = ArrayBuffer(parseExpr())
      while (eatOp(",")) vals += parseExpr()
      expectOp(")")
      return mark(Assign(names.toSeq, vals.toSeq), ln)
    }
    // dotted name → session conf (SET hplsql.onerror = SETERROR)
    if (la(1).text == ".") {
      val key = new StringBuilder(advance().text)
      while (eatOp(".")) key.append('.').append(advance().text)
      expectOp("=")
      return mark(ConfSet(key.toString.toLowerCase, advance().up), ln)
    }
    val names = ArrayBuffer.empty[String]
    val vals = ArrayBuffer.empty[Expr]
    var more = true
    while (more) {
      names += advance().text
      if (!eatOp("=")) expectOp(":=")
      vals += parseExpr()
      more = eatOp(",")
    }
    mark(Assign(names.toSeq, vals.toSeq), ln)
  }

  // ---- IF -----------------------------------------------------------------

  private def parseIf(ln: Int): Stmt = {
    advance() // IF
    val cond = parseExpr()
    if (eatKw("THEN")) {
      val branches = ArrayBuffer((cond, parseStmtsUntil(Set("ELSIF", "ELSEIF", "ELSE", "END"))))
      while (at("ELSIF") || at("ELSEIF")) {
        advance()
        val c = parseExpr()
        expectKw("THEN")
        branches += ((c, parseStmtsUntil(Set("ELSIF", "ELSEIF", "ELSE", "END"))))
      }
      val els = if (eatKw("ELSE")) parseStmtsUntil(Set("END")) else Nil
      expectKw("END")
      eatKw("IF")
      mark(IfS(branches.toSeq, els), ln)
    } else {
      // T-SQL: IF cond single_block_stmt [ELSE single_block_stmt]
      val thenB = parseSingleBlock()
      eatSemi()
      val els = if (eatKw("ELSE")) parseSingleBlock() else Nil
      mark(IfS(Seq((cond, thenB)), els), ln)
    }
  }

  private def parseSingleBlock(): Seq[Stmt] =
    if (at("BEGIN")) {
      advance()
      val b = parseStmtsUntil(Set("END"))
      expectKw("END")
      b
    } else Seq(parseStmt())

  // ---- WHILE / FOR --------------------------------------------------------

  private def parseWhile(ln: Int, label: Option[String]): Stmt = {
    advance() // WHILE
    val cond = parseExpr()
    // LOOP | DO | THEN | BEGIN  ... END LOOP | END WHILE | END
    val opened =
      if (eatKw("LOOP")) "LOOP" else if (eatKw("DO")) "WHILE"
      else if (eatKw("THEN")) "WHILE" else if (eatKw("BEGIN")) "" else "WHILE"
    val body = parseStmtsUntil(Set("END"))
    expectKw("END")
    if (opened.nonEmpty) { eatKw(opened); eatKw("LOOP"); eatKw("WHILE") }
    mark(WhileS(cond, body, label), ln)
  }

  private def parseFor(ln: Int, label: Option[String]): Stmt = {
    advance() // FOR
    val v = advance().text
    expectKw("IN")
    if (atOp("(") && (la(1).is("SELECT") || la(1).is("WITH"))) {
      advance()
      val sql = captureSqlTokens(stopAtCloseParen = true)
      expectOp(")")
      expectKw("LOOP")
      val body = parseStmtsUntil(Set("END"))
      expectKw("END"); eatKw("LOOP")
      return mark(ForCursor(v, sql, body, label), ln)
    }
    if (at("SELECT") || at("WITH")) {
      // parens are OPTIONAL in the reference grammar (for_cursor_stmt:
      // T_FOR ident T_IN T_OPEN_P? select_stmt T_CLOSE_P? T_LOOP)
      val sql = captureSqlTokens(stopAtKw = Some("LOOP"))
      expectKw("LOOP")
      val body = parseStmtsUntil(Set("END"))
      expectKw("END"); eatKw("LOOP")
      return mark(ForCursor(v, sql, body, label), ln)
    }
    val reverse = eatKw("REVERSE")
    val from = parseExpr()
    expectOp("..")
    val to = parseExpr()
    val by = if (eatKw("BY") || eatKw("STEP")) Some(parseExpr()) else None
    expectKw("LOOP")
    val body = parseStmtsUntil(Set("END"))
    expectKw("END"); eatKw("LOOP")
    mark(ForRange(v, from, to, by, reverse, body, label), ln)
  }

  // ---- EXEC / EXECUTE -----------------------------------------------------

  private def parseExec(ln: Int): Stmt = {
    advance() // EXEC | EXECUTE
    eatKw("IMMEDIATE")
    // `EXEC name;` on a KNOWN procedure is a call, not dynamic SQL from a
    // variable — routines register at parse-run order in the interp, so
    // the decision is made there via CallProc; only a STRING or a
    // var||expr spelling is dynamic SQL. (`EXEC v;` where v holds SQL
    // still works: CallProc falls back to dynamic execution when no
    // routine of that name exists — see Interp's CallProc handler.)
    if (cur.kind == Tok.Str ||
        (cur.kind == Tok.Ident && la(1).kind == Tok.Op && (la(1).up == "INTO" || la(1).text == "||")) ||
        (cur.kind == Tok.Ident && la(1).is("INTO"))) {
      val sqlE = parseExpr()
      val into = if (eatKw("INTO")) {
        val xs = ArrayBuffer(advance().text)
        while (eatOp(",")) xs += advance().text
        xs.toSeq
      } else Nil
      mark(ExecDyn(sqlE, into), ln)
    } else {
      val name = advance().text
      if (eatOp("(")) mark(CallProc(name, parseArgs()), ln)
      else if (!atOp(";") && cur.kind != Tok.EOF) {
        // T-SQL paren-less argument list: EXEC p 'x', 2;
        val xs = ArrayBuffer(parseExpr())
        while (eatOp(",")) xs += parseExpr()
        mark(CallProc(name, xs.toSeq), ln)
      } else mark(ExecName(name), ln) // procedure vs SQL-holding variable: decided at run time
    }
  }

  // ---- CREATE PROCEDURE / FUNCTION ---------------------------------------

  private def parseCreateRoutine(ln: Int): Stmt = {
    if (eatKw("CREATE")) { if (eatKw("OR")) expectKw("REPLACE") }
    val isFunction = cur.is("FUNCTION")
    advance() // PROCEDURE | PROC | FUNCTION
    val name = advance().text
    val params = parseParamList()
    skipReturnType()
    if (!eatKw("AS")) eatKw("IS")
    val body = parseRoutineBody(ln)
    // consume optional trailing routine name after END (already handled in block)
    if (cur.kind == Tok.Ident && cur.text.equalsIgnoreCase(name)) advance()
    mark(CreateRoutine(name, params.toSeq, body.filter(_ != NullS), isFunction), ln)
  }

  /** Routine body after AS/IS: `BEGIN..END`, `DECLARE..BEGIN..END`, the
    * Oracle `IS <decl items;> BEGIN..END` form (create_procedure3.sql,
    * create_function3.sql), or a bare statement list closed by END. */
  private def parseRoutineBody(ln: Int): Seq[Stmt] = {
    if (at("BEGIN") || at("DECLARE")) Seq(parseStmt())
    else if (cur.kind == Tok.Ident && !stmtStarters.contains(cur.up) &&
             (typeNames.contains(la(1).up) || la(1).text == "." ||
              typeNames.contains(la(2).up))) {
      val decls = ArrayBuffer.empty[Stmt]
      eatSemi()
      while (!at("BEGIN") && cur.kind != Tok.EOF) { decls += parseDeclItem(); eatSemi() }
      Seq(parseBeginBlock(ln, decls.toSeq))
    } else parseStmtsUntil(Set("END")) :+ { expectKw("END"); NullS }
  }

  private def parseParamList(): Seq[Param] = {
    val params = ArrayBuffer.empty[Param]
    if (eatOp("(")) {
      while (!atOp(")")) {
        var sawIn = false; var out = false
        def eatDirection(): Unit = {
          var seen = true
          while (seen) {
            if (eatKw("IN")) { sawIn = true; seen = true }
            else if (eatKw("OUT")) { out = true; seen = true }
            else if (eatKw("INOUT")) { sawIn = true; out = true; seen = true }
            else seen = false
          }
        }
        eatDirection()
        val pname = advance().text
        eatDirection() // Oracle postfix form: `cur OUT SYS_REFCURSOR`
        val tsb = new StringBuilder(advance().up)
        while (atOp(".")) { advance(); tsb.append('.').append(advance().up) }
        if (eatOp("(")) { while (!atOp(")")) tsb.append(advance().text); expectOp(")") }
        val dflt = if (eatKw("DEFAULT") || eatOp(":=") || eatOp("=")) Some(parseExpr()) else None
        // direction defaults to IN; a bare OUT param is NOT in (starts NULL
        // in the callee — reference OUT semantics); INOUT sets both
        params += Param(pname, tsb.toString, out, in = sawIn || !out, dflt)
        eatOp(",")
      }
      expectOp(")")
    }
    params.toSeq
  }

  private def skipReturnType(): Unit = {
    if (eatKw("RETURNS") || eatKw("RETURN")) {
      advance() // return type name
      while (atOp(".")) { advance(); advance() }
      if (eatOp("(")) { while (!atOp(")")) advance(); expectOp(")") }
    }
    // DB2 `DYNAMIC RESULT SETS n` header — result-set count is implicit
    // here (every opened WITH RETURN cursor is returned)
    if (eatKw("DYNAMIC")) { expectKw("RESULT"); expectKw("SETS"); advance() }
  }

  // ---- CREATE PACKAGE [BODY] ---------------------------------------------

  /** Oracle-style package spec/body (reference create_package.sql corpus):
    * spec = variable decls + routine prototypes; body = variable decls +
    * full routine definitions with `IS BEGIN ... END;` members. */
  private def parseCreatePackage(ln: Int): Stmt = {
    advance() // CREATE
    if (eatKw("OR")) expectKw("REPLACE")
    expectKw("PACKAGE")
    val isBody = eatKw("BODY")
    val name = advance().text
    if (!eatKw("AS")) eatKw("IS")
    val members = ArrayBuffer.empty[Stmt]
    eatSemi()
    while (!at("END") && cur.kind != Tok.EOF) {
      if (at("FUNCTION") || at("PROCEDURE") || at("PROC")) {
        val mln = cur.line
        val isFunction = cur.is("FUNCTION")
        advance()
        val rname = advance().text
        val params = parseParamList()
        skipReturnType()
        if (eatKw("IS") || eatKw("AS") || at("BEGIN") || at("DECLARE")) {
          val body = parseRoutineBody(mln)
          if (cur.kind == Tok.Ident && cur.text.equalsIgnoreCase(rname)) advance()
          members += mark(CreateRoutine(rname, params, body.filter(_ != NullS), isFunction), mln)
        } // else: prototype in the spec — registration happens in the body
      } else {
        members += mark(parseDeclItem(), cur.line)
      }
      eatSemi()
    }
    expectKw("END")
    if (cur.kind == Tok.Ident && cur.text.equalsIgnoreCase(name)) advance()
    mark(CreatePackage(name, members.toSeq, isBody), ln)
  }

  // ---- BEGIN ... EXCEPTION ... END ----------------------------------------

  private def parseBeginBlock(ln: Int, decls: Seq[Stmt]): Stmt = {
    expectKw("BEGIN")
    val body = parseStmtsUntil(Set("EXCEPTION", "END"))
    val handlers = ArrayBuffer.empty[(String, Seq[Stmt])]
    if (eatKw("EXCEPTION")) {
      while (at("WHEN")) {
        advance()
        val cond = advance().up
        expectKw("THEN")
        handlers += ((cond, parseStmtsUntil(Set("WHEN", "END"))))
      }
    }
    expectKw("END")
    // optional block label after END
    if (cur.kind == Tok.Ident && !stmtStarters.contains(cur.up) && la(1).text == ";") advance()
    mark(Block(decls, body, handlers.toSeq), ln)
  }

  // ---- VALUES INTO --------------------------------------------------------

  private def parseValuesInto(ln: Int): Stmt = {
    advance() // VALUES
    val vals = ArrayBuffer.empty[Expr]
    if (eatOp("(")) { vals += parseExpr(); while (eatOp(",")) vals += parseExpr(); expectOp(")") }
    else vals += parseExpr()
    expectKw("INTO")
    val into = ArrayBuffer.empty[String]
    if (eatOp("(")) { into += advance().text; while (eatOp(",")) into += advance().text; expectOp(")") }
    else into += advance().text
    mark(ValuesInto(vals.toSeq, into.toSeq), ln)
  }

  // ---- SELECT [INTO] / passthrough ---------------------------------------

  /** Capture raw SQL tokens up to a top-level ';' (or unbalanced ')'). */
  private def captureSqlTokens(stopAtCloseParen: Boolean = false,
                               stopAtKw: Option[String] = None): Seq[Token] = {
    val out = ArrayBuffer.empty[Token]
    var depth = 0
    var done = false
    while (!done && cur.kind != Tok.EOF) {
      if (atOp("(")) depth += 1
      if (atOp(")")) {
        if (depth == 0 && stopAtCloseParen) done = true
        else depth -= 1
      }
      if (depth == 0 && stopAtKw.exists(cur.is)) done = true
      if (!done) {
        if (atOp(";") && depth == 0) done = true
        else out += advance()
      }
    }
    out.toSeq
  }

  /** COPY source: tokens until the top-level TO. */
  private def captureCopySource(): Seq[Token] = {
    val out = ArrayBuffer.empty[Token]
    var depth = 0
    var done = false
    while (!done && cur.kind != Tok.EOF) {
      if (atOp("(")) depth += 1
      if (atOp(")")) depth -= 1
      if (depth == 0 && (cur.is("TO") || atOp(";"))) done = true
      else out += advance()
    }
    out.toSeq
  }

  /** Minimal java-style unescape for COPY delimiters ('\01', '\t'). */
  private def unescapeJava(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't' => sb.append('\t'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case d if d.isDigit =>
            var j = i + 1
            while (j < s.length && j < i + 4 && s.charAt(j).isDigit) j += 1
            sb.append(Integer.parseInt(s.substring(i + 1, j), 8).toChar)
            i = j
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** One CMP source: tokens until a top-level ',', AT, or ';'. */
  private def captureCmpSource(): Seq[Token] = {
    val out = ArrayBuffer.empty[Token]
    var depth = 0
    var done = false
    while (!done && cur.kind != Tok.EOF) {
      if (atOp("(")) depth += 1
      if (atOp(")")) depth -= 1
      if (depth == 0 && (atOp(",") || atOp(";") || cur.is("AT"))) done = true
      else out += advance()
    }
    out.toSeq
  }

  private def parseSelectMaybeInto(ln: Int): Stmt = {
    val sql = captureSqlTokens()
    // find a top-level INTO: SELECT ... INTO v1, v2 FROM ...
    var depth = 0
    var intoAt = -1
    var fromAt = -1
    for ((t, idx) <- sql.zipWithIndex) {
      if (t.kind == Tok.Op && t.text == "(") depth += 1
      else if (t.kind == Tok.Op && t.text == ")") depth -= 1
      else if (depth == 0 && t.is("INTO") && intoAt < 0) intoAt = idx
      else if (depth == 0 && t.is("FROM") && fromAt < 0) fromAt = idx
    }
    if (intoAt >= 0 && (fromAt < 0 || intoAt < fromAt)) {
      val into = sql.slice(intoAt + 1, if (fromAt >= 0) fromAt else sql.length)
        .filter(_.kind == Tok.Ident).map(_.text)
      val rest = sql.take(intoAt) ++ (if (fromAt >= 0) sql.drop(fromAt) else Nil)
      mark(SelectInto(normalizeTop(rest), into), ln)
    } else mark(SqlPassthrough(normalizeTop(sql)), ln)
  }

  /** T-SQL `SELECT TOP n ...` → strip, append LIMIT n when absent
    * (the reference's Select.java does the same rewrite for Hive). */
  private def normalizeTop(sql: Seq[Token]): Seq[Token] = {
    if (sql.length > 2 && sql.head.is("SELECT") && sql(1).is("TOP") && sql(2).kind == Tok.Num) {
      val n = sql(2)
      val rest = sql.head +: sql.drop(3)
      if (rest.exists(_.is("LIMIT"))) rest
      else rest ++ Seq(Token(Tok.Ident, "LIMIT", n.line), n)
    } else sql
  }

  private def parsePassthrough(ln: Int): Stmt =
    mark(SqlPassthrough(captureSqlTokens()), ln)

  private def parseStmtsUntil(stop: Set[String]): Seq[Stmt] = {
    val out = ArrayBuffer.empty[Stmt]
    eatSemi()
    while (cur.kind != Tok.EOF && !stop.exists(at)) {
      out += parseStmt()
      eatSemi()
    }
    out.toSeq
  }

  // ---- expressions --------------------------------------------------------

  private def parseArgs(): Seq[Expr] = {
    val args = ArrayBuffer.empty[Expr]
    if (!atOp(")")) {
      args += parseExpr()
      // ANSI SUBSTRING(s FROM pos FOR len) — FROM/FOR separate like commas
      while (eatOp(",") || eatKw("FROM") || eatKw("FOR")) args += parseExpr()
    }
    expectOp(")")
    args.toSeq
  }

  def parseExpr(): Expr = parseOr()

  private def parseOr(): Expr = {
    var l = parseAnd()
    while (eatKw("OR")) l = Bin("OR", l, parseAnd())
    l
  }

  private def parseAnd(): Expr = {
    var l = parseNot()
    while (eatKw("AND")) l = Bin("AND", l, parseNot())
    l
  }

  private def parseNot(): Expr =
    if (eatKw("NOT")) Un("NOT", parseNot()) else parseComparison()

  private def parseComparison(): Expr = {
    var l = parseAdditive()
    var done = false
    while (!done) {
      if (cur.kind == Tok.Op && Set("=", "==", "<>", "!=", "<", ">", "<=", ">=").contains(cur.text)) {
        val op = advance().text
        l = Bin(if (op == "==") "=" else op, l, parseAdditive())
      } else if (cur.is("IS")) {
        advance()
        val neg = eatKw("NOT")
        expectKw("NULL")
        l = IsNull(l, neg)
      } else if (cur.is("BETWEEN") || (cur.is("NOT") && la(1).is("BETWEEN"))) {
        val neg = eatKw("NOT")
        expectKw("BETWEEN")
        val lo = parseAdditive()
        expectKw("AND")
        val hi = parseAdditive()
        l = Between(l, lo, hi, neg)
      } else if (cur.is("LIKE") || (cur.is("NOT") && la(1).is("LIKE"))) {
        val neg = eatKw("NOT")
        expectKw("LIKE")
        l = LikeE(l, parseAdditive(), neg)
      } else if (cur.is("IN") || (cur.is("NOT") && la(1).is("IN"))) {
        val neg = eatKw("NOT")
        expectKw("IN")
        expectOp("(")
        val items = ArrayBuffer(parseExpr())
        while (eatOp(",")) items += parseExpr()
        expectOp(")")
        l = InList(l, items.toSeq, neg)
      } else done = true
    }
    l
  }

  private val intervalUnits = Set("DAY", "DAYS", "HOUR", "HOURS", "MINUTE", "MINUTES",
    "SECOND", "SECONDS", "MICROSECOND", "MICROSECONDS", "MONTH", "MONTHS", "YEAR", "YEARS")

  private def parseAdditive(): Expr = {
    var l = parseMultiplicative()
    var done = false
    while (!done) {
      if (atOp("+") || atOp("-")) {
        val op = advance().text
        // ANSI interval literal: expr +/- INTERVAL 'n' DAY. Only plain
        // numeric values — a multi-field literal (INTERVAL '1-2' YEAR TO
        // MONTH) must not reach BigDecimal (raw NumberFormatException)
        if (cur.is("INTERVAL") && la(1).kind == Tok.Str &&
            la(1).text.trim.matches("[+-]?\\d+(\\.\\d+)?") &&
            la(2).kind == Tok.Ident && intervalUnits.contains(la(2).up)) {
          advance()
          val n = advance().text
          val unit = advance().up
          l = IntervalAdd(l, if (op == "+") 1 else -1, NumLit(BigDecimal(n.trim)), unit)
        } else {
          val r = parseMultiplicative()
          // interval form: expr + n DAYS
          if (cur.kind == Tok.Ident && intervalUnits.contains(cur.up)) {
            val unit = advance().up
            l = IntervalAdd(l, if (op == "+") 1 else -1, r, unit)
          } else l = Bin(op, l, r)
        }
      } else if (atOp("||")) {
        advance()
        l = Bin("||", l, parseMultiplicative())
      } else done = true
    }
    l
  }

  private def parseMultiplicative(): Expr = {
    var l = parseUnary()
    // cursor attributes (`c%FOUND`) are consumed inside parsePrimary, so a
    // surviving '%' here is always the modulo operator — incl. `a % b`
    while (atOp("*") || atOp("/") || atOp("%")) {
      val op = advance().text
      l = Bin(op, l, parseUnary())
    }
    l
  }

  private def parseUnary(): Expr =
    if (atOp("-")) { advance(); Un("-", parseUnary()) }
    else if (atOp("+")) { advance(); parseUnary() }
    else parsePrimary()

  private def parsePrimary(): Expr = {
    val t = cur
    if (t.kind == Tok.Num) { advance(); return NumLit(BigDecimal(t.text)) }
    if (t.kind == Tok.Str) { advance(); return StrLit(t.text) }
    if (atOp("(")) {
      advance()
      val e = parseExpr()
      expectOp(")")
      return e
    }
    if (t.is("NULL")) { advance(); return NullLit }
    if (t.is("TRUE")) { advance(); return BoolLit(true) }
    if (t.is("FALSE")) { advance(); return BoolLit(false) }
    if (t.is("DATE") && la(1).kind == Tok.Str) { advance(); return DateLit(advance().text) }
    if (t.is("TIMESTAMP") && la(1).kind == Tok.Str) { advance(); return TimestampLit(advance().text) }
    if (t.is("CASE")) return parseCase()
    if (t.is("CAST") && la(1).text == "(") {
      advance(); advance()
      val e = parseExpr()
      expectKw("AS")
      val tsb = new StringBuilder(advance().up)
      if (eatOp("(")) {
        tsb.append('(')
        while (!atOp(")")) tsb.append(advance().text)
        expectOp(")")
        tsb.append(')')
      }
      expectOp(")")
      return CastE(e, tsb.toString)
    }
    if (t.kind == Tok.Ident) {
      advance()
      // cursor attribute c%FOUND / c%NOTFOUND / c%ISOPEN
      if (atOp("%") && la(1).kind == Tok.Ident &&
          Set("FOUND", "NOTFOUND", "ISOPEN", "ROWCOUNT").contains(la(1).up)) {
        advance()
        val attr = advance().up
        return CursorAttr(t.text, attr)
      }
      if (atOp("(")) { advance(); return FnCall(t.up, parseArgs()) }
      if (atOp(".") && la(1).kind == Tok.Ident && la(2).text != "(") {
        advance()
        val f = advance().text
        return FieldRef(t.text, f)
      }
      if (atOp(".") && la(1).kind == Tok.Ident && la(2).text == "(") {
        // pkg.func(args) — treat dotted call as a function call
        advance()
        val f = advance().up
        advance()
        return FnCall(t.up + "." + f, parseArgs())
      }
      return VarRef(t.text)
    }
    throw new ParseError(s"line ${t.line}: unexpected token '${t.text}'")
  }

  private def parseCase(): Expr = {
    expectKw("CASE")
    val subject = if (!cur.is("WHEN")) Some(parseExpr()) else None
    val whens = ArrayBuffer.empty[(Expr, Expr)]
    while (eatKw("WHEN")) {
      val c = parseExpr()
      expectKw("THEN")
      whens += ((c, parseExpr()))
    }
    val els = if (eatKw("ELSE")) Some(parseExpr()) else None
    expectKw("END")
    CaseE(subject, whens.toSeq, els)
  }
}

private[hplsql] object Parser {
  def parse(src: String): Seq[Stmt] = new Parser(Lexer.lex(src)).parseProgram()
}
