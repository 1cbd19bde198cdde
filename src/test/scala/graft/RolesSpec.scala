package graft

import org.apache.hadoop.security.AccessControlException
import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

import graft.security.{AccessPolicies, AuthDdl, Roles}

/** SQL-standard ROLES (security/Roles — SQLStdHiveAccessController.java
  * createRole:252 / grantRole:287 / setCurrentRole:519 analog). Pins:
  * privileges granted to a role reach members transitively; `public` is
  * implicit and universal; admin gating requires SET ROLE admin even for
  * members; SET ROLE narrows and restores activation; role-to-role
  * grants refuse cycles; dropped roles vanish from memberships and
  * decisions; the DDL surface drives all of it. */
class RolesSpec extends AnyFunSuite {
  import TestSession._

  private val dir = "target/storage/roles_spec/orders"

  private def fresh(): Unit = {
    Tables.orders(spark, sf).limit(50)
      .write.mode(SaveMode.Overwrite).parquet(dir)
    AccessPolicies.clear()
    Roles.clear()
    AccessPolicies.protect(dir)
    Roles.addAdmin("root")
    spark.conf.set("graft.auth.user", "root")
    Roles.setCurrentRole(spark, "admin")
  }

  private def as[T](user: String)(body: => T): T = {
    val prev = spark.conf.getOption("graft.auth.user")
    val prevRoles = spark.conf.getOption("graft.auth.roles")
    spark.conf.set("graft.auth.user", user)
    spark.conf.unset("graft.auth.roles")
    try body finally {
      prev.fold(spark.conf.unset("graft.auth.user"))(spark.conf.set("graft.auth.user", _))
      prevRoles.fold(spark.conf.unset("graft.auth.roles"))(spark.conf.set("graft.auth.roles", _))
    }
  }

  private def cleanup(): Unit = {
    AccessPolicies.clear()
    Roles.clear()
    spark.conf.unset("graft.auth.user")
    spark.conf.unset("graft.auth.roles")
  }

  test("privileges granted to a role reach members; revoking membership closes access") {
    fresh()
    try {
      Roles.create(spark, "analyst")
      Roles.grantToUser(spark, "analyst", "alice")
      AccessPolicies.grant(dir, Roles.rolePrincipal("analyst"), "SELECT")
      as("alice") { assert(spark.read.parquet(dir).count() == 50) }
      as("bob") { intercept[AccessControlException](spark.read.parquet(dir).count()) }
      Roles.revokeFromUser(spark, "analyst", "alice")
      as("alice") { intercept[AccessControlException](spark.read.parquet(dir).count()) }
    } finally cleanup()
  }

  test("role-to-role grants resolve transitively and refuse cycles") {
    fresh()
    try {
      Roles.create(spark, "reader")
      Roles.create(spark, "analyst")
      // holding analyst implies holding reader
      Roles.grantToRole(spark, "reader", "analyst")
      Roles.grantToUser(spark, "analyst", "carol")
      AccessPolicies.grant(dir, Roles.rolePrincipal("reader"), "SELECT")
      as("carol") { assert(spark.read.parquet(dir).count() == 50) }
      assert(Roles.rolesOf("carol") == Set("analyst", "reader", "public"))
      intercept[IllegalArgumentException](Roles.grantToRole(spark, "analyst", "reader"))
      intercept[IllegalArgumentException](Roles.grantToRole(spark, "reader", "reader"))
    } finally cleanup()
  }

  test("public is implicit: a grant to role public opens the object to everyone") {
    fresh()
    try {
      AccessPolicies.grant(dir, Roles.rolePrincipal("public"), "SELECT")
      as("nobody_special") { assert(spark.read.parquet(dir).count() == 50) }
    } finally cleanup()
  }

  test("admin gating: members must SET ROLE admin; non-members cannot administer") {
    fresh()
    try {
      Roles.create(spark, "ops")
      Roles.grantToUser(spark, "admin", "dave")
      as("dave") {
        // member, but admin is not active by default (initUserRoles
        // excludes it) — role administration refused until SET ROLE
        intercept[AccessControlException](Roles.create(spark, "newrole"))
        Roles.setCurrentRole(spark, "admin")
        Roles.create(spark, "newrole")
        assert(Roles.showRoles(spark).contains("newrole"))
      }
      as("eve") {
        intercept[AccessControlException](Roles.setCurrentRole(spark, "admin"))
        intercept[AccessControlException](Roles.create(spark, "evil"))
      }
    } finally cleanup()
  }

  test("SET ROLE narrows activation to one membership; ALL restores; NONE drops to public") {
    fresh()
    try {
      Roles.create(spark, "red")
      Roles.create(spark, "blue")
      Roles.grantToUser(spark, "red", "frank")
      Roles.grantToUser(spark, "blue", "frank")
      AccessPolicies.grant(dir, Roles.rolePrincipal("blue"), "SELECT")
      as("frank") {
        assert(spark.read.parquet(dir).count() == 50)
        Roles.setCurrentRole(spark, "red") // blue's grant no longer active
        intercept[AccessControlException](spark.read.parquet(dir).count())
        Roles.setCurrentRole(spark, "all")
        assert(spark.read.parquet(dir).count() == 50)
        Roles.setCurrentRole(spark, "none")
        intercept[AccessControlException](spark.read.parquet(dir).count())
        assert(Roles.currentRoles(spark) == Set("public"))
      }
    } finally cleanup()
  }

  test("dropping a role removes it from memberships and from authorization decisions") {
    fresh()
    try {
      Roles.create(spark, "temp")
      Roles.grantToUser(spark, "temp", "gina")
      AccessPolicies.grant(dir, Roles.rolePrincipal("temp"), "SELECT")
      as("gina") { assert(spark.read.parquet(dir).count() == 50) }
      Roles.drop(spark, "temp")
      as("gina") {
        intercept[AccessControlException](spark.read.parquet(dir).count())
        assert(Roles.rolesOf("gina") == Set("public"))
      }
      // a NEW role reusing the name starts with no privileges — the
      // drop purged the old role's grants, they must not resurrect
      Roles.create(spark, "temp")
      Roles.grantToUser(spark, "temp", "hank")
      as("hank") { intercept[AccessControlException](spark.read.parquet(dir).count()) }
    } finally cleanup()
  }

  test("mask policies honor exempt roles: active auditor reads raw, dropping it re-masks") {
    fresh()
    try {
      val gov = "target/storage/roles_spec/governed_customer"
      Tables.customer(spark, sf).limit(80)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(gov)
      graft.plans.MaskPolicies.drop(gov)
      graft.plans.MaskPolicies.register(spark, gov,
        rowFilter = None, masks = Map("c_name" -> "mask(c_name)"),
        exemptRoles = Set("auditor"))
      try {
        Roles.create(spark, "auditor")
        Roles.grantToUser(spark, "auditor", "amy")
        def names() = spark.read.parquet(gov).select("c_name")
          .limit(5).collect().map(_.getString(0)).toSeq
        // no auditor role: masked (digits become n)
        as("zed") { assert(names().forall(_.forall(c => !c.isDigit))) }
        as("amy") {
          assert(names().exists(_.exists(_.isDigit))) // role active by default
          Roles.setCurrentRole(spark, "none")
          assert(names().forall(_.forall(c => !c.isDigit))) // re-masked
          Roles.setCurrentRole(spark, "auditor")
          assert(names().exists(_.exists(_.isDigit))) // raw again
        }
      } finally graft.plans.MaskPolicies.drop(gov)
    } finally cleanup()
  }

  test("role DDL routes through the HPL/SQL passthrough (HiveParser.g setRole/showRoles)") {
    fresh()
    try {
      import graft.hplsql.Hplsql
      Hplsql.run(spark,
        """CREATE ROLE pipeline;
          |GRANT ROLE pipeline TO USER ivan;""".stripMargin)
      assert(Roles.exists("pipeline"))
      assert(Roles.rolesOf("ivan").contains("pipeline"))
      as("ivan") {
        Hplsql.run(spark, "SET ROLE pipeline;")
        assert(Roles.currentRoles(spark) == Set("pipeline", "public"))
        Hplsql.run(spark, "SET ROLE NONE;")
        assert(Roles.currentRoles(spark) == Set("public"))
        Hplsql.run(spark, "SET ROLE ALL;")
        assert(Roles.currentRoles(spark) == Set("pipeline", "public"))
      }
      // a variable legitimately named role still assigns
      assert(Hplsql.run(spark,
        "DECLARE role INT; SET role = 5; PRINT role;").output.trim == "5")
    } finally cleanup()
  }

  test("role DDL surface: CREATE/GRANT/SET/SHOW/REVOKE/DROP ROLE round-trip") {
    fresh()
    try {
      spark.sql("CREATE TABLE roles_ddl_t USING parquet LOCATION " +
        s"'${new java.io.File(dir).getAbsolutePath}'")
      try {
        AuthDdl.run(spark, "CREATE ROLE etl")
        AuthDdl.run(spark, "GRANT ROLE etl TO USER henry")
        AuthDdl.run(spark, "GRANT SELECT, INSERT ON TABLE roles_ddl_t TO ROLE etl")
        assert(AuthDdl.run(spark, "SHOW GRANT ROLE etl ON TABLE roles_ddl_t")
          .collect().map(_.getString(1)).toSet == Set("SELECT", "INSERT"))
        assert(AuthDdl.run(spark, "SHOW ROLE GRANT USER henry")
          .collect().map(_.getString(0)).toSet == Set("etl", "public"))
        assert(AuthDdl.run(spark, "SHOW PRINCIPALS etl")
          .collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
          Seq(("USER", "henry")))
        as("henry") {
          assert(AuthDdl.run(spark, "SHOW CURRENT ROLES")
            .collect().map(_.getString(0)).toSet == Set("etl", "public"))
          assert(spark.read.parquet(dir).count() == 50)
        }
        // grants to an unknown role are refused, as in the metastore
        intercept[IllegalArgumentException](
          AuthDdl.run(spark, "GRANT SELECT ON TABLE roles_ddl_t TO ROLE ghost"))
        AuthDdl.run(spark, "REVOKE ROLE etl FROM USER henry")
        as("henry") { intercept[AccessControlException](spark.read.parquet(dir).count()) }
        AuthDdl.run(spark, "DROP ROLE etl")
        assert(!Roles.exists("etl"))
      } finally spark.sql("DROP TABLE IF EXISTS roles_ddl_t")
    } finally cleanup()
  }
}
