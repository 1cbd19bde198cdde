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

  /** Throw unless `principal` holds `priv` on a PROTECTED `dir`
    * (unprotected dirs are ungoverned objects: always allowed). */
  def check(spark: SparkSession, tableDir: String, priv: String): Unit =
    checkPath(spark, normalize(tableDir), priv)

  private[security] def checkPath(spark: SparkSession, key: String, priv: String): Unit =
    Option(byPath.get(key)).foreach { grants =>
      val user = currentUser(spark)
      val held = Option(grants.get(user)).getOrElse(Set.empty)
      if (!held(priv.toUpperCase)) {
        val heldStr = if (held.isEmpty) "none" else held.mkString(",")
        throw new AccessControlException(
          s"principal '$user' lacks $priv on $key (held: $heldStr)")
      }
    }

  private[security] def lookupKey(rootPath: org.apache.hadoop.fs.Path): Option[String] = {
    val key = rootPath.toUri.getPath.stripSuffix("/")
    if (byPath.containsKey(key)) Some(key) else None
  }

  private def normalize(dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir).toUri.getPath
    val abs = if (new java.io.File(p).isAbsolute) p
              else new java.io.File(p).getAbsolutePath
    abs.stripSuffix("/")
  }
}

/** Read-path enforcement: reject any plan scanning a protected dir
  * without SELECT. Runs in the optimizer, so EVERY execution path —
  * DataFrame, SQL, a subquery inside somebody's view — hits it. */
object AuthorizationRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (AccessPolicies.isEmpty) return plan
    plan.foreach {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.headOption
          .flatMap(AccessPolicies.lookupKey)
          .foreach(key => AccessPolicies.checkPath(SparkSession.active, key, "SELECT"))
      case _ =>
    }
    plan
  }
}
