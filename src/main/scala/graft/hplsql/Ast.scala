package graft.hplsql

/** AST + token model for the HPL/SQL procedural layer.
  *
  * Mirrors the surface of the reference interpreter
  * (hplsql/src/main/java/org/apache/hive/hplsql/Exec.java, grammar at
  * hplsql/src/main/antlr4/org/apache/hive/hplsql/Hplsql.g4) — the WHAT:
  * statements, scoping, OUT parameters, cursor attributes, exception
  * blocks. The HOW is a fresh Scala recursive-descent parser + tree
  * interpreter over a SparkSession; set-based statements pass through to
  * Spark SQL with variable substitution (the reference does the same
  * against its JDBC connection, Exec.java executes via Conn.java).
  */
private[hplsql] object Tok {
  sealed trait Kind
  case object Ident extends Kind   // bare, @x, #x, $x forms
  case object QIdent extends Kind  // delimited: "q", [q], `q` — never a keyword, never substituted
  case object Num extends Kind
  case object Str extends Kind     // raw value WITHOUT quotes, '' unescaped
  case object Op extends Kind      // punctuation / operators
  case object EOF extends Kind
}

private[hplsql] final case class Token(kind: Tok.Kind, text: String, line: Int) {
  /** Uppercased text — keyword comparisons are case-insensitive. */
  lazy val up: String = text.toUpperCase
  def is(s: String): Boolean = kind != Tok.Str && kind != Tok.QIdent && up == s
}

private[hplsql] object Ast {
  sealed trait Expr
  case class NumLit(v: BigDecimal) extends Expr
  case class StrLit(v: String) extends Expr
  case class BoolLit(v: Boolean) extends Expr
  case object NullLit extends Expr
  case class DateLit(iso: String) extends Expr
  case class TimestampLit(iso: String) extends Expr
  case class VarRef(name: String) extends Expr
  case class FieldRef(rec: String, field: String) extends Expr // rec.col
  case class CursorAttr(cursor: String, attr: String) extends Expr // c%FOUND
  case class Un(op: String, e: Expr) extends Expr
  case class Bin(op: String, l: Expr, r: Expr) extends Expr
  case class IsNull(e: Expr, negated: Boolean) extends Expr
  case class Between(e: Expr, lo: Expr, hi: Expr, negated: Boolean) extends Expr
  case class InList(e: Expr, items: Seq[Expr], negated: Boolean) extends Expr
  case class LikeE(e: Expr, pat: Expr, negated: Boolean) extends Expr
  case class FnCall(name: String, args: Seq[Expr]) extends Expr
  case class CaseE(subject: Option[Expr], whens: Seq[(Expr, Expr)], els: Option[Expr]) extends Expr
  case class CastE(e: Expr, dtype: String) extends Expr
  /** `expr + 3 DAYS` — interval arithmetic on date/timestamp values. */
  case class IntervalAdd(base: Expr, sign: Int, n: Expr, unit: String) extends Expr

  sealed trait Stmt { var line: Int = 0 }
  case class DeclareVar(names: Seq[String], dtype: String, init: Option[Expr]) extends Stmt
  case class DeclareCursor(name: String, sql: Seq[Token], withReturn: Boolean = false) extends Stmt
  /** ALLOCATE c CURSOR FOR PROCEDURE p — bind the next unconsumed
    * returned result set of the last CALL of p (DB2 result-set flow,
    * create_procedure_return_cursor.sql). */
  case class AllocateCursor(name: String, proc: String) extends Stmt
  case class AllocateCursorLoc(name: String, locator: String) extends Stmt
  case class AssociateLocator(locators: Seq[String], proc: String) extends Stmt
  case class DeclareHandler(exit: Boolean, cond: String, body: Seq[Stmt]) extends Stmt
  case class DeclareCondition(name: String) extends Stmt
  case class Assign(targets: Seq[String], values: Seq[Expr]) extends Stmt
  case class ConfSet(key: String, value: String) extends Stmt // SET a.b = IDENT
  case class Print(e: Option[Expr]) extends Stmt
  case class IfS(branches: Seq[(Expr, Seq[Stmt])], els: Seq[Stmt]) extends Stmt
  case class WhileS(cond: Expr, body: Seq[Stmt], label: Option[String]) extends Stmt
  case class ForRange(v: String, from: Expr, to: Expr, by: Option[Expr],
                      reverse: Boolean, body: Seq[Stmt], label: Option[String]) extends Stmt
  case class ForCursor(rec: String, sql: Seq[Token], body: Seq[Stmt], label: Option[String]) extends Stmt
  case class ExitS(label: Option[String], when: Option[Expr]) extends Stmt
  /** OPEN c — a declared cursor; OPEN c FOR <sql> — a SYS_REFCURSOR
    * variable bound to a fresh result set (sys_refcursor.sql). */
  case class OpenCur(name: String, forSql: Option[Seq[Token]]) extends Stmt
  case class FetchCur(name: String, into: Seq[String]) extends Stmt
  case class CloseCur(name: String) extends Stmt
  case class SelectInto(sqlNoInto: Seq[Token], into: Seq[String]) extends Stmt
  case class ExecDyn(sql: Expr, into: Seq[String]) extends Stmt
  /** `EXEC name;` — ambiguous until runtime: a registered procedure is
    * CALLED; otherwise a variable of that name holds dynamic SQL. */
  case class ExecName(name: String) extends Stmt
  case class ValuesInto(values: Seq[Expr], into: Seq[String]) extends Stmt
  case class CreateRoutine(name: String, params: Seq[Param], body: Seq[Stmt],
                           isFunction: Boolean) extends Stmt
  /** CREATE [OR REPLACE] PACKAGE [BODY] — members are DeclareVar /
    * CreateRoutine items; prototypes in the spec half parse to NullS. */
  case class CreatePackage(name: String, members: Seq[Stmt], isBody: Boolean) extends Stmt
  /** INCLUDE path — tokens after the keyword (a string expression or a
    * bare unquoted path). */
  case class IncludeS(tokens: Seq[Token]) extends Stmt
  case class CallProc(name: String, args: Seq[Expr]) extends Stmt
  case class ReturnS(e: Option[Expr]) extends Stmt
  case class Block(decls: Seq[Stmt], body: Seq[Stmt], handlers: Seq[(String, Seq[Stmt])]) extends Stmt
  /** Standalone multi-item DECLARE — runs in the CURRENT scope (no block). */
  case class DeclGroup(items: Seq[Stmt]) extends Stmt
  case class SqlPassthrough(tokens: Seq[Token]) extends Stmt
  case class HostCmd(cmd: Expr) extends Stmt
  case class SignalS(cond: String) extends Stmt
  /** bare RAISE — rethrow the error being handled (create_function4.sql). */
  case object RaiseS extends Stmt
  /** CMP ROW_COUNT|SUM source1, source2 — data-diff validation
    * (reference Cmp.java). Each source is a table [WHERE ...] or a
    * parenthesized subquery, captured raw. */
  case class CmpS(mode: String, left: Seq[Token], right: Seq[Token]) extends Stmt
  /** COPY table|(subquery) TO [HDFS] target [DELIMITER 'x'] [SQLINSERT t]
    * [AT conn] — reference Copy.java: export to a delimited file, a file
    * of INSERT statements, or another table. */
  case class CopyS(src: Seq[Token], target: String, toFile: Boolean,
                   delimiter: Option[String], sqlInsert: Option[String]) extends Stmt
  case class ExprStmt(e: Expr) extends Stmt
  case object NullS extends Stmt

  /** Routine parameter: direction IN (default) / OUT / INOUT. */
  final case class Param(name: String, dtype: String, out: Boolean, in: Boolean,
                         default: Option[Expr])
}
