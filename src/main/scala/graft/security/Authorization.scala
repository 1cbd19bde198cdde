package graft.security

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.hadoop.security.AccessControlException
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** SQL-standard object authorization — the reference's
  * SQLStdHiveAuthorizationValidator (ql/src/java/org/apache/hadoop/hive/
  * ql/security/authorization/plugin/sqlstd/
  * SQLStdHiveAuthorizationValidator.java: every compiled query's
  * read/write entities are checked against the GRANT store before
  * execution) re-expressed for the path-addressed warehouse:
  *
  *  - [[AccessPolicies.protect]] places a table dir under authorization
  *    (DEFAULT DENY from then on, like an object with no granted privs);
  *    grant/revoke maintain (principal, privilege) pairs per dir.
  *  - READ enforcement is an injected Catalyst rule: any plan that scans
  *    a protected dir without SELECT for the session's principal throws
  *    AccessControlException at planning time — however the query is
  *    phrased, the check sits on the scan, not the statement.
  *  - WRITE enforcement is a chokepoint call ([[AccessPolicies.check]])
  *    from the DML entry points (CopyOnWrite update/delete/merge,
  *    Versioned commit lanes) — the same per-operation privilege mapping
  *    the SQLStd validator applies (UPDATE/DELETE/INSERT).
  *
  * The session principal is `graft.auth.user` in the session conf
  * (defaulting to the Spark user), so one cluster app can serve
  * differently-privileged sessions the way HiveServer2 sessions carry
  * their authenticated user. Checks are one concurrent-map lookup —
  * nothing touches the data path, so enforcement is free at 100 TB.
  *
  * Trust boundary (by design, same as [[graft.PathKeys.plantedToken]]'s
  * doc): this is in-process enforcement for a TRUSTED application
  * serving untrusted queries/sessions — the application authenticates
  * its users and sets `graft.auth.user` on their behalf (the
  * HiveServer2 model, where the server process is trusted and `set
  * hive.server2...` style confs are gated by the server). Code that can
  * call `spark.conf.set` directly is inside the trust boundary and can
  * impersonate; that is the documented model, not a bypass.
  */
object AccessPolicies {

  val Privileges: Set[String] = Set("SELECT", "INSERT", "UPDATE", "DELETE")

  // dir -> principal -> granted privileges
  private val byPath = new ConcurrentHashMap[String, ConcurrentHashMap[String, Set[String]]]()

  def protect(tableDir: String): Unit =
    byPath.putIfAbsent(normalize(tableDir), new ConcurrentHashMap())

  def unprotect(tableDir: String): Unit = byPath.remove(normalize(tableDir))
  def clear(): Unit = byPath.clear()
  def isEmpty: Boolean = byPath.isEmpty

  def grant(tableDir: String, principal: String, privs: String*): Unit = {
    require(privs.nonEmpty && privs.forall(p => Privileges(p.toUpperCase)),
      s"unknown privilege in ${privs.mkString(",")} (know: ${Privileges.mkString(",")})")
    protect(tableDir)
    byPath.get(normalize(tableDir)).merge(principal, privs.map(_.toUpperCase).toSet,
      (a, b) => a ++ b)
  }

  def revoke(tableDir: String, principal: String, privs: String*): Unit = {
    require(privs.forall(p => Privileges(p.toUpperCase)), s"unknown privilege")
    Option(byPath.get(normalize(tableDir))).foreach { grants =>
      grants.computeIfPresent(principal,
        (_, held) => held -- privs.map(_.toUpperCase).toSet)
    }
  }

  def currentUser(spark: SparkSession): String =
    spark.conf.getOption("graft.auth.user").getOrElse(spark.sparkContext.sparkUser)

  /** Remove every grant held by `principal` across all governed dirs —
    * DROP ROLE's privilege cleanup (the metastore deletes the role's
    * rows from the privilege tables, so a LATER role of the same name
    * starts with nothing; without this, stale grants would resurrect). */
  private[security] def purgePrincipal(principal: String): Unit =
    byPath.forEach((_, grants) => grants.remove(principal))

  /** Current grants on a dir: (principal, privilege) pairs, sorted. */
  def grants(tableDir: String): Seq[(String, String)] =
    Option(byPath.get(normalize(tableDir))).toSeq.flatMap { g =>
      g.asScala.toSeq.flatMap { case (u, ps) => ps.toSeq.map(p => (u, p)) }
    }.sorted

  /** Throw unless `principal` holds `priv` on a PROTECTED `dir`
    * (unprotected dirs are ungoverned objects: always allowed). Resolves
    * by CONTAINMENT like the read side: DML addressed at a subpath of a
    * protected dir (a partition dir, a versioned snapshot dir) is DML on
    * the governed object and faces the same check. */
  def check(spark: SparkSession, tableDir: String, priv: String): Unit =
    graft.PathKeys.containingKey(byPath.keySet.asScala,
        new org.apache.hadoop.fs.Path(normalize(tableDir)))
      .foreach(key => checkPath(spark, key, priv))

  private[security] def checkPath(spark: SparkSession, key: String, priv: String): Unit =
    Option(byPath.get(key)).foreach { grants =>
      val user = currentUser(spark)
      val held = effective(spark, grants, user)
      if (!held(priv.toUpperCase)) {
        val heldStr = if (held.isEmpty) "none" else held.mkString(",")
        throw new AccessControlException(
          s"principal '$user' lacks $priv on $key (held: $heldStr)")
      }
    }

  /** Effective privileges = direct user grants + grants of every
    * CURRENTLY ACTIVE role (SQLAuthorizationUtils
    * .getPrivilegesFromMetaStore unions user- and role-principal grants
    * the same way; activation is [[Roles.currentRoles]]). */
  private def effective(spark: SparkSession,
                        grants: ConcurrentHashMap[String, Set[String]],
                        user: String): Set[String] = {
    val direct = Option(grants.get(user)).getOrElse(Set.empty)
    val viaRoles = Roles.currentRoles(spark).flatMap(r =>
      Option(grants.get(Roles.rolePrincipal(r))).getOrElse(Set.empty))
    direct ++ viaRoles
  }

  /** Governed key for a scan root — CONTAINMENT, not equality: a scan
    * of a partition subdir, a single data file, or a versioned table's
    * `_versions/vN` snapshot dir is a read of the governed object and
    * must face the same check (the reference resolves every entity back
    * to its table before checkPrivileges). Nested governed dirs resolve
    * to the LONGEST key — the most specific object's grants decide, never
    * hash-iteration order. */
  private[security] def lookupKey(rootPath: org.apache.hadoop.fs.Path): Option[String] =
    graft.PathKeys.containingKey(byPath.keySet.asScala, rootPath)

  /** Protected dirs that are STRICT descendants of a scan root — the
    * ancestor bypass (a recursive read of the warehouse parent sweeps
    * up protected data): every swept-up object's grants must be checked
    * too, not just containment upward. */
  private[security] def keysUnder(rootPath: org.apache.hadoop.fs.Path): Seq[String] =
    graft.PathKeys.containedKeys(byPath.keySet.asScala, rootPath)

  /** Every governed object a scan of `root` touches, without throwing —
    * the EXPLAIN AUTHORIZATION probe (ExplainTask's authorization mode
    * reports required privileges instead of failing the query): the
    * containing governed dir plus any governed dirs swept up underneath
    * an ancestor scan. */
  def governing(root: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(normalize(root))
    (lookupKey(p).toSeq ++ keysUnder(p)).distinct
  }

  /** Privileges the current principal EFFECTIVELY holds on a governed
    * key — direct plus active-role grants, the same view enforcement
    * uses (read by EXPLAIN AUTHORIZATION). */
  def held(spark: SparkSession, key: String): Set[String] =
    Option(byPath.get(key))
      .map(g => effective(spark, g, currentUser(spark))).getOrElse(Set.empty)

  private def normalize(dir: String): String = graft.PathKeys.normalize(dir)
}

/** Read-path enforcement: reject any plan scanning a protected dir
  * without SELECT. Runs in the optimizer, so EVERY execution path —
  * DataFrame, SQL, a subquery inside somebody's view — hits it.
  *
  * Per-session instances are injected by GraftExtensions so the
  * principal is read from the session that OWNS the plan — on a shared
  * thread, `SparkSession.active` may be a DIFFERENT session, and an
  * authorization decision made with another session's principal is
  * exactly the cross-session confusion this must never have. */
class AuthorizationRule(sessionOf: () => SparkSession) extends Rule[LogicalPlan] {
  private def checkRoot(r: org.apache.hadoop.fs.Path): Unit = {
    // Both directions of containment face the check: a root INSIDE a
    // protected dir reads the governed object (lookupKey), and a root
    // ABOVE one sweeps its files up (keysUnder — the
    // recursiveFileLookup-on-parent bypass).
    AccessPolicies.lookupKey(r)
      .foreach(key => AccessPolicies.checkPath(sessionOf(), key, "SELECT"))
    AccessPolicies.keysUnder(r)
      .foreach(key => AccessPolicies.checkPath(sessionOf(), key, "SELECT"))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (AccessPolicies.isEmpty) return plan
    plan.foreach {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        // EVERY root of a multi-path relation is checked — a protected
        // dir must not slip through behind an unprotected first path
        fs.location.rootPaths.foreach(checkRoot)
      // DataSource V2 lane (the graftkv external-storage connector):
      // a kv store under a protected dir is the same governed object
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        r.table match {
          case kv: graft.sources.KvTable =>
            checkRoot(new org.apache.hadoop.fs.Path(graft.PathKeys.normalize(kv.dir)))
          case _ =>
        }
      case s: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        s.relation.table match {
          case kv: graft.sources.KvTable =>
            checkRoot(new org.apache.hadoop.fs.Path(graft.PathKeys.normalize(kv.dir)))
          case _ =>
        }
      case _ =>
    }
    plan
  }
}

/** Thread-active-session singleton for tests/ad-hoc use; GraftExtensions
  * injects per-session instances. */
object AuthorizationRule extends AuthorizationRule(() => SparkSession.active)

/** SQL surface for the GRANT store — the reference's authorization DDL
  * (HiveParser.g grantPrivileges/revokePrivileges/showGrants, executed
  * by DDLTask against the metastore's grant tables). Spark has no
  * GRANT grammar, so the HPL/SQL passthrough routes these three
  * statements here, exactly as it routes constraint and MV DDL:
  *
  * {{{
  *   GRANT SELECT, INSERT ON TABLE t TO USER alice;
  *   REVOKE UPDATE ON t FROM alice;
  *   SHOW GRANT [USER alice] ON TABLE t;
  * }}}
  *
  * The table name resolves to its storage LOCATION through the session
  * catalog (DESCRIBE FORMATTED — the public route), because the grant
  * store is path-addressed like every governed object here. */
object AuthDdl {

  private val GrantRe =
    """(?is)\s*GRANT\s+([A-Z, ]+?)\s+ON\s+(?:TABLE\s+)?([\w.]+)\s+TO\s+(?:(USER|ROLE)\s+)?([\w]+)\s*;?\s*""".r
  private val RevokeRe =
    """(?is)\s*REVOKE\s+([A-Z, ]+?)\s+ON\s+(?:TABLE\s+)?([\w.]+)\s+FROM\s+(?:(USER|ROLE)\s+)?([\w]+)\s*;?\s*""".r
  private val ShowRe =
    """(?is)\s*SHOW\s+GRANT\s+(?:(USER|ROLE)\s+([\w]+)\s+)?ON\s+(?:TABLE\s+)?([\w.]+)\s*;?\s*""".r

  // Role administration (HiveParser.g createRoleStatement,
  // grantRole/revokeRole, setRole, showRoles/showCurrentRole/
  // showRolePrincipals — executed by DDLTask against
  // SQLStdHiveAccessController).
  private val CreateRoleRe = """(?is)\s*CREATE\s+ROLE\s+([\w]+)\s*;?\s*""".r
  private val DropRoleRe = """(?is)\s*DROP\s+ROLE\s+([\w]+)\s*;?\s*""".r
  private val GrantRoleRe =
    """(?is)\s*GRANT\s+ROLE\s+([\w]+)\s+TO\s+(USER|ROLE)\s+([\w]+)\s*;?\s*""".r
  private val RevokeRoleRe =
    """(?is)\s*REVOKE\s+ROLE\s+([\w]+)\s+FROM\s+(USER|ROLE)\s+([\w]+)\s*;?\s*""".r
  private val SetRoleRe = """(?is)\s*SET\s+ROLE\s+([\w]+)\s*;?\s*""".r
  private val ShowRolesRe = """(?is)\s*SHOW\s+ROLES\s*;?\s*""".r
  private val ShowCurrentRe = """(?is)\s*SHOW\s+CURRENT\s+ROLES\s*;?\s*""".r
  private val ShowRoleGrantRe =
    """(?is)\s*SHOW\s+ROLE\s+GRANT\s+USER\s+([\w]+)\s*;?\s*""".r
  private val ShowPrincipalsRe =
    """(?is)\s*SHOW\s+PRINCIPALS\s+([\w]+)\s*;?\s*""".r

  def matches(sql: String): Boolean = sql match {
    case GrantRoleRe(_, _, _) | RevokeRoleRe(_, _, _) => true
    case GrantRe(_, _, _, _) | RevokeRe(_, _, _, _) | ShowRe(_, _, _) => true
    case CreateRoleRe(_) | DropRoleRe(_) | SetRoleRe(_) => true
    case ShowRolesRe() | ShowCurrentRe() | ShowRoleGrantRe(_) | ShowPrincipalsRe(_) => true
    case _ => false
  }

  /** "role:x" for ROLE principals (the grant store's discriminator),
    * the bare name for USER (absent type defaults to USER, as in the
    * reference grammar's principalName). A ROLE grantee must exist —
    * the metastore fails grants to unknown roles. */
  private def principalKey(kind: String, name: String): String =
    if (kind != null && kind.equalsIgnoreCase("ROLE")) {
      if (!Roles.exists(name))
        throw new IllegalArgumentException(s"role $name does not exist")
      Roles.rolePrincipal(name)
    } else name

  def run(spark: SparkSession, sql: String): org.apache.spark.sql.DataFrame = sql match {
    case GrantRoleRe(role, kind, grantee) =>
      if (kind.equalsIgnoreCase("ROLE")) Roles.grantToRole(spark, role, grantee)
      else Roles.grantToUser(spark, role, grantee)
      spark.emptyDataFrame
    case RevokeRoleRe(role, kind, grantee) =>
      if (kind.equalsIgnoreCase("ROLE")) Roles.revokeFromRole(spark, role, grantee)
      else Roles.revokeFromUser(spark, role, grantee)
      spark.emptyDataFrame
    case GrantRe(privs, table, kind, principal) =>
      AccessPolicies.grant(locationOf(spark, table),
        principalKey(kind, principal), splitPrivs(privs): _*)
      spark.emptyDataFrame
    case RevokeRe(privs, table, kind, principal) =>
      AccessPolicies.revoke(locationOf(spark, table),
        principalKey(kind, principal), splitPrivs(privs): _*)
      spark.emptyDataFrame
    case ShowRe(kind, principal, table) =>
      import scala.jdk.CollectionConverters._
      val want = if (principal == null) null else principalKey(kind, principal)
      val rows = AccessPolicies.grants(locationOf(spark, table))
        .filter { case (u, _) => want == null || u == want }
        .map { case (u, p) => org.apache.spark.sql.Row(u, p) }
      spark.createDataFrame(rows.asJava,
        org.apache.spark.sql.types.StructType.fromDDL(
          "principal STRING, privilege STRING"))
    case CreateRoleRe(role) => Roles.create(spark, role); spark.emptyDataFrame
    case DropRoleRe(role) => Roles.drop(spark, role); spark.emptyDataFrame
    case SetRoleRe(role) => Roles.setCurrentRole(spark, role); spark.emptyDataFrame
    case ShowRolesRe() => Roles.df(spark, "role", Roles.showRoles(spark))
    case ShowCurrentRe() =>
      Roles.df(spark, "role", Roles.currentRoles(spark).toSeq.sorted)
    case ShowRoleGrantRe(user) =>
      Roles.df(spark, "role", Roles.rolesOf(user).toSeq.sorted)
    case ShowPrincipalsRe(role) =>
      import scala.jdk.CollectionConverters._
      val rows = Roles.principals(spark, role)
        .map { case (k, n) => org.apache.spark.sql.Row(k, n) }
      spark.createDataFrame(rows.asJava,
        org.apache.spark.sql.types.StructType.fromDDL(
          "principal_type STRING, principal_name STRING"))
    case _ => throw new IllegalArgumentException(s"not an authorization statement: $sql")
  }

  private def splitPrivs(s: String): Seq[String] =
    s.split(",").map(_.trim.toUpperCase).filter(_.nonEmpty).toSeq

  private def locationOf(spark: SparkSession, table: String): String =
    spark.sql(s"DESCRIBE FORMATTED $table").collect()
      .find(r => Option(r.getString(0)).exists(_.trim.equalsIgnoreCase("Location")))
      .map(_.getString(1).trim)
      .getOrElse(throw new IllegalArgumentException(
        s"cannot resolve storage location for table $table"))
}
