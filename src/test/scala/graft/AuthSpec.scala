package graft

import org.apache.hadoop.security.AccessControlException
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.acid.{CopyOnWrite, Versioned}
import graft.security.AccessPolicies

/** SQL-standard authorization (security/Authorization — the reference's
  * SQLStdHiveAuthorizationValidator analog). Pins: a protected dir is
  * default-deny for SELECT however the query is phrased; GRANT/REVOKE
  * change the decision without touching data; the write chokepoints
  * (CopyOnWrite UPDATE/DELETE/MERGE, Versioned commits) enforce their
  * SQLStd per-operation privileges; unprotected dirs stay ungoverned;
  * the principal is per-session conf, not process-global. */
class AuthSpec extends AnyFunSuite {
  import TestSession._

  private val dir = "target/storage/auth_spec/orders"

  private def freshProtected(user: String, privs: String*): Unit = {
    Tables.orders(spark, sf).limit(200)
      .write.mode(SaveMode.Overwrite).parquet(dir)
    AccessPolicies.clear()
    AccessPolicies.protect(dir)
    if (privs.nonEmpty) AccessPolicies.grant(dir, user, privs: _*)
    spark.conf.set("graft.auth.user", user)
  }

  private def cleanup(): Unit = {
    AccessPolicies.clear()
    spark.conf.unset("graft.auth.user")
  }

  test("protected dir is default-deny; GRANT SELECT opens it; REVOKE closes it") {
    freshProtected("alice")
    try {
      intercept[AccessControlException](spark.read.parquet(dir).count())
      // phrased differently: inside a join, still denied
      intercept[AccessControlException] {
        Tables.orders(spark, sf).join(spark.read.parquet(dir), "o_orderkey").count()
      }
      AccessPolicies.grant(dir, "alice", "SELECT")
      assert(spark.read.parquet(dir).count() == 200)
      AccessPolicies.revoke(dir, "alice", "SELECT")
      intercept[AccessControlException](spark.read.parquet(dir).count())
      // reading a FILE of the protected dir is the same object: denied
      val file = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.getPath
      intercept[AccessControlException](spark.read.parquet(file).count())
      // an unprotected table is ungoverned throughout
      assert(Tables.orders(spark, sf).limit(5).count() == 5)
    } finally cleanup()
  }

  test("write chokepoints enforce SQLStd per-operation privileges") {
    freshProtected("bob", "SELECT")
    try {
      intercept[AccessControlException](
        CopyOnWrite.update(spark, dir, lit(true), Map("o_orderpriority" -> lit("X"))))
      intercept[AccessControlException](
        CopyOnWrite.delete(spark, dir, col("o_orderkey") < 10))
      AccessPolicies.grant(dir, "bob", "UPDATE")
      assert(CopyOnWrite.update(spark, dir,
        col("o_orderkey") < 10, Map("o_orderpriority" -> lit("X"))) >= 0)
      // MERGE needs INSERT too
      val src = spark.read.parquet(dir).limit(3)
      intercept[AccessControlException](
        CopyOnWrite.merge(spark, dir, src, Seq("o_orderkey")))
      AccessPolicies.grant(dir, "bob", "INSERT", "DELETE")
      CopyOnWrite.merge(spark, dir, src, Seq("o_orderkey"))
      assert(CopyOnWrite.delete(spark, dir, col("o_orderkey") < 5) >= 0)
    } finally cleanup()
  }

  test("multi-path scans, nested protections, and subpath DML cannot bypass enforcement") {
    val open = "target/storage/auth_spec/open"
    Tables.orders(spark, sf).limit(50).write.mode(SaveMode.Overwrite).parquet(open)
    freshProtected("alice") // protected dir, no grants
    try {
      // a protected dir behind an unprotected first path is still denied
      intercept[AccessControlException](spark.read.parquet(open, dir).count())
      // nested protection: the MOST SPECIFIC key's grants decide
      val outer = "target/storage/auth_spec/outer"
      val inner = s"$outer/secret"
      Tables.orders(spark, sf).limit(20).write.mode(SaveMode.Overwrite).parquet(inner)
      AccessPolicies.grant(outer, "alice", "SELECT")
      AccessPolicies.protect(inner) // no grants: default deny
      intercept[AccessControlException](spark.read.parquet(inner).count())
      val innerFile = new java.io.File(inner).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.getPath
      intercept[AccessControlException](spark.read.parquet(innerFile).count())
      // subpath DML: UPDATE aimed at a child dir of a protected table is
      // DML on the governed object (alice holds no UPDATE anywhere here)
      intercept[AccessControlException](
        CopyOnWrite.update(spark, inner, lit(true),
          Map("o_orderpriority" -> lit("X"))))
      // ancestor bypass: a recursive scan rooted ABOVE the protected dir
      // sweeps its files up and must face the same SELECT check
      intercept[AccessControlException](
        spark.read.option("recursiveFileLookup", "true")
          .schema(Tables.orders(spark, sf).schema)
          .parquet("target/storage/auth_spec").count())
    } finally cleanup()
  }

  test("GRANT/REVOKE/SHOW GRANT SQL statements drive the grant store (HPL/SQL DDL route)") {
    val loc = java.nio.file.Files.createTempDirectory("graft_auth_ddl").toString
    Tables.orders(spark, sf).limit(50).write.mode(SaveMode.Overwrite).parquet(loc)
    spark.sql("DROP TABLE IF EXISTS auth_t")
    spark.sql(s"CREATE TABLE auth_t (o_orderkey BIGINT) USING parquet LOCATION '$loc'")
    AccessPolicies.clear()
    try {
      graft.hplsql.Hplsql.run(spark, "GRANT SELECT, INSERT ON TABLE auth_t TO USER carol;")
      // granting protected the location: default-deny for everyone else
      spark.conf.set("graft.auth.user", "mallory")
      intercept[AccessControlException](spark.table("auth_t").count())
      spark.conf.set("graft.auth.user", "carol")
      assert(spark.table("auth_t").count() == 50)
      // SHOW GRANT reflects the store
      val shown = graft.security.AuthDdl.run(spark, "SHOW GRANT USER carol ON TABLE auth_t")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(shown == Set(("carol", "SELECT"), ("carol", "INSERT")), shown.toString)
      // REVOKE closes it again
      graft.hplsql.Hplsql.run(spark, "REVOKE SELECT ON auth_t FROM carol;")
      intercept[AccessControlException](spark.table("auth_t").count())
    } finally {
      cleanup()
      spark.sql("DROP TABLE IF EXISTS auth_t")
    }
  }

  test("versioned commits require INSERT; the principal is session conf, not global") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_auth_ver").toString + "/t"
    AccessPolicies.clear()
    AccessPolicies.protect(base)
    AccessPolicies.grant(base, "ingest", "INSERT", "UPDATE", "SELECT")
    try {
      spark.conf.set("graft.auth.user", "intruder")
      intercept[AccessControlException](
        Versioned.commit(spark, base, Seq((1L, "a")).toDF("k", "v")))
      spark.conf.set("graft.auth.user", "ingest")
      assert(Versioned.commit(spark, base, Seq((1L, "a")).toDF("k", "v")) == 1)
      assert(Versioned.commitDelta(spark, base, Seq("k"),
        upserts = Seq((2L, "b")).toDF("k", "v")) == 2)
      // the delta lane maps privileges by statement shape (SQLStd MERGE
      // rule): a deletes frame needs DELETE — an INSERT+UPDATE-only
      // principal must not delete through commitDelta around the check
      // Versioned.delete enforces
      intercept[AccessControlException](
        Versioned.commitDelta(spark, base, Seq("k"),
          upserts = Seq((3L, "c")).toDF("k", "v"),
          deletes = Some(Seq(Tuple1(1L)).toDF("k"))))
      AccessPolicies.grant(base, "ingest", "DELETE")
      assert(Versioned.commitDelta(spark, base, Seq("k"),
        upserts = Seq((3L, "c")).toDF("k", "v"),
        deletes = Some(Seq(Tuple1(1L)).toDF("k"))) == 3)
      assert(Versioned.readMerged(spark, base, Seq("k")).count() == 2) // k=2,3 (1 deleted)
      // version snapshot dirs live UNDER base: SELECT is enforced on them
      // by prefix (the versioned table is one governed object)
      assert(Versioned.readMerged(spark, base, Seq("k")).count() == 2)
      spark.conf.set("graft.auth.user", "intruder")
      intercept[AccessControlException](
        Versioned.readMerged(spark, base, Seq("k")).count())
    } finally cleanup()
  }
}
