package graft.hplsql

import org.apache.spark.sql.DataFrame

import graft.{Q, Tables}

/** Driver-gate query for the HPL/SQL layer: a genuinely procedural
  * per-region report — cursor loop over `region`, a stored procedure
  * with OUT parameters doing SELECT INTO per key, results INSERTed row
  * by row through the variable-substituting SQL passthrough — whose
  * final table must hash-match a purely relational DuckDB recompute.
  * This is the reference's canonical usage shape (cursor + procedure +
  * dynamic SQL, hplsql/src/test/queries/db), proving the procedural
  * layer orchestrates the set-based engine without corrupting values.
  *
  * Money spelling: the balance is summed as DECIMAL(25,2) then cast to
  * DOUBLE on both engine and oracle sides — the same convention every
  * hash-green money row uses (see Relational.scala dsum) — so the
  * driver's value hash canonicalizes identically on both engines.
  *
  * Scale note: the loop runs once per REGION (5 rows) — the O(data)
  * work stays inside the set-based statements the interpreter ships to
  * Spark. That division is the design (see Interp.scala header); a
  * 100 TB deployment drives the same script unchanged.
  */
object HplsqlGate {

  private val script =
    """DROP TABLE IF EXISTS hpl_region_report;
      |CREATE TABLE hpl_region_report
      |  (r_name STRING, nations INT, custs INT, total_bal DOUBLE)
      |  USING parquet LOCATION '%LOC%';
      |
      |CREATE PROCEDURE region_stats(IN rkey INT, OUT n_nations INT,
      |                              OUT n_cust INT, OUT bal DOUBLE)
      |BEGIN
      |  SELECT COUNT(*) INTO n_nations FROM nation WHERE n_regionkey = rkey;
      |  SELECT COUNT(*),
      |         CAST(COALESCE(SUM(CAST(c_acctbal AS DECIMAL(25,2))), 0) AS DOUBLE)
      |    INTO n_cust, bal
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  WHERE n_regionkey = rkey;
      |END;
      |
      |DECLARE CURSOR c1 IS SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey;
      |DECLARE rk INT;
      |DECLARE rname STRING;
      |DECLARE nnat INT;
      |DECLARE ncust INT;
      |DECLARE tbal DOUBLE;
      |
      |OPEN c1;
      |FETCH c1 INTO rk, rname;
      |WHILE c1%FOUND LOOP
      |  CALL region_stats(rk, nnat, ncust, tbal);
      |  INSERT INTO hpl_region_report VALUES (rname, nnat, ncust, tbal);
      |  FETCH c1 INTO rk, rname;
      |END LOOP;
      |CLOSE c1;
      |""".stripMargin

  val q263_hplsql_report: Q = (s, d) => {
    Seq("region", "nation", "customer").foreach(t =>
      Tables.load(s, d, t).createOrReplaceTempView(t))
    // fresh external location per run: a stale warehouse dir from an
    // earlier process must not block CREATE TABLE (DROP IF EXISTS can't
    // see a table that was only in a previous session's catalog)
    val loc = java.nio.file.Files.createTempDirectory("hpl_region_report").toString
    Hplsql.run(s, script.replace("%LOC%", loc))
    s.table("hpl_region_report").orderBy("r_name")
  }

  val queries: Map[String, Q] = Map(
    "q263_hplsql_report" -> q263_hplsql_report,
  )

  val oracles: Map[String, String] = Map(
    "q263_hplsql_report" ->
      """SELECT r.r_name,
        |  CAST(COUNT(DISTINCT n.n_nationkey) AS INT) AS nations,
        |  CAST(COUNT(c.c_custkey) AS INT) AS custs,
        |  CAST(COALESCE(SUM(CAST(c.c_acctbal AS DECIMAL(25,2))), 0) AS DOUBLE) AS total_bal
        |FROM region r
        |LEFT JOIN nation n ON n.n_regionkey = r.r_regionkey
        |LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
        |GROUP BY r.r_name
        |ORDER BY r.r_name""".stripMargin,
  )
}
