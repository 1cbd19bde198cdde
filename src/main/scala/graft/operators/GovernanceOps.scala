package graft.operators

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.plans.MaskPolicies

/** Gate row for policy-driven data governance (plans/TableMask — the
  * reference's TableMask.java / Ranger seam): a customer table is placed
  * under a policy (row filter + two column masks), then queried with
  * PLAIN reads — no masking in the query text. The rule must substitute
  * masked expressions and the row filter transparently, and the DuckDB
  * oracle recomputes the same report with EXPLICIT relational masking,
  * so the gate hash-pins both the mask semantics (Spark mask(): upper→X,
  * lower→x, digit→n; mask_hash = md5) and the governed-scan rewrite.
  *
  * The policy is registered against a gate-local COPY of customer:
  * policies are JVM-global by table location, and governing the shared
  * testdata dir would mask every other gate row's scan of customer.
  */
object GovernanceOps {

  private def gateDir(sfDir: String, name: String) =
    s"target/storage/${new java.io.File(sfDir).getName}/$name"

  /** mask_show_last_n(c_name, 4) spelled as a policy SQL string. */
  private val nameMask =
    "concat(mask(substr(c_name, 1, greatest(length(c_name) - 4, 0))), " +
      "substr(c_name, greatest(length(c_name) - 4, 0) + 1, 4))"

  val q293_masked_policy: Q = (s, d) => {
    val dir = gateDir(d, "governed_customer")
    Tables.customer(s, d).write.mode(SaveMode.Overwrite).parquet(dir)
    MaskPolicies.drop(dir)
    // the GROUP KEY itself is hash-masked: the report groups by digests,
    // proving consumers never see even the segment labels; the row
    // filter applies to RAW values underneath (Ranger evaluation order)
    MaskPolicies.register(s, dir,
      rowFilter = Some("c_mktsegment <> 'MACHINERY'"),
      masks = Map(
        "c_mktsegment" -> "md5(cast(c_mktsegment as binary))",
        "c_name" -> nameMask))
    // plain query: no mask anywhere in the text — the rule injects it
    s.read.parquet(dir)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
           min(col("c_name")).as("min_masked_name"),
           max(col("c_name")).as("max_masked_name"))
      .orderBy(col("c_mktsegment"))
  }

  /** Role-scoped masking (the Ranger policy-item carve-out grafted onto
    * plans/TableMask + security/Roles): the policy names an exempt role
    * (`auditor`); the gate session holds no such role, so its PLAIN
    * read must come back masked and row-filtered — which the oracle
    * recomputes relationally. The exemption side (an ACTIVE auditor
    * role reads raw; dropping it re-masks) is pinned by RolesSpec,
    * since "raw" is only observable against the engine itself. */
  val q297_role_masking: Q = (s, d) => {
    val dir = gateDir(d, "governed_customer_roles")
    Tables.customer(s, d).write.mode(SaveMode.Overwrite).parquet(dir)
    MaskPolicies.drop(dir)
    MaskPolicies.register(s, dir,
      rowFilter = Some("c_acctbal > 0"),
      masks = Map("c_name" -> "md5(cast(c_name as binary))"),
      exemptRoles = Set("auditor"))
    s.read.parquet(dir)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
           min(col("c_name")).as("min_masked_name"),
           max(col("c_name")).as("max_masked_name"))
      .orderBy(col("c_nationkey"))
  }

  val queries: Map[String, Q] = Map(
    "q293_masked_policy" -> q293_masked_policy,
    "q297_role_masking" -> q297_role_masking,
  )

  val oracles: Map[String, String] = Map(
    "q293_masked_policy" ->
      """WITH masked AS (
        |  SELECT md5(c_mktsegment) AS c_mktsegment,
        |         concat(
        |           regexp_replace(regexp_replace(regexp_replace(
        |             substr(c_name, 1, greatest(length(c_name) - 4, 0)),
        |             '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g'),
        |           substr(c_name, greatest(length(c_name) - 4, 0) + 1, 4)) AS c_name
        |  FROM customer
        |  WHERE c_mktsegment <> 'MACHINERY')
        |SELECT c_mktsegment,
        |       count(*) AS n,
        |       min(c_name) AS min_masked_name,
        |       max(c_name) AS max_masked_name
        |FROM masked
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q297_role_masking" ->
      """WITH masked AS (
        |  SELECT c_nationkey, md5(c_name) AS c_name
        |  FROM customer
        |  WHERE c_acctbal > 0)
        |SELECT c_nationkey, count(*) AS n,
        |       min(c_name) AS min_masked_name,
        |       max(c_name) AS max_masked_name
        |FROM masked
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
  )
}
