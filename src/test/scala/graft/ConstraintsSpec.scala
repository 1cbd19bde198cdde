package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{ConstraintCatalog, ConstraintDdl, ConstraintRewrites}

/** Informational PK/FK constraints (HIVE-13290 parity) and the rewrites
  * they license. Fire cases pin the optimized-plan SHAPE (join gone,
  * aggregate gone) — the oracle rows in ConstraintOps pin the VALUES — and
  * the no-fire cases pin every soundness precondition: RELY required, dim
  * columns referenced, filtered dim side, partial-PK grouping, non-PK
  * join keys. The rule ships in every session via GraftExtensions, so the
  * no-fire paths are what 99% of plans hit; they must stay exact no-ops.
  */
class ConstraintsSpec extends AnyFunSuite {
  import TestSession._

  private def withTpchConstraints[A](rely: Boolean = true)(body: => A): A = {
    ConstraintCatalog.clear()
    // scan identity verifies against the session catalog: names must
    // resolve to the scanned locations or no rewrite fires
    Tables.registerAll(spark, sf)
    val suffix = if (rely) "RELY" else "NORELY"
    ConstraintDdl.run(s"ALTER TABLE orders ADD CONSTRAINT pk_orders PRIMARY KEY (o_orderkey) DISABLE NOVALIDATE $suffix")
    ConstraintDdl.run(s"ALTER TABLE customer ADD CONSTRAINT pk_customer PRIMARY KEY (c_custkey) DISABLE NOVALIDATE $suffix")
    ConstraintDdl.run(s"ALTER TABLE lineitem ADD CONSTRAINT fk_line_order FOREIGN KEY (l_orderkey) REFERENCES orders (o_orderkey) DISABLE NOVALIDATE $suffix")
    try body finally ConstraintCatalog.clear()
  }

  private def optimized(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("DDL surface: add, describe, drop; ENABLE rejected like the reference") {
    ConstraintCatalog.clear()
    ConstraintDdl.run("ALTER TABLE orders ADD CONSTRAINT pk_orders PRIMARY KEY (o_orderkey) DISABLE NOVALIDATE RELY")
    ConstraintDdl.run("ALTER TABLE lineitem ADD CONSTRAINT fk_lo FOREIGN KEY (l_orderkey) REFERENCES orders (o_orderkey) DISABLE NOVALIDATE")
    val desc = ConstraintCatalog.describe(spark).collect()
    assert(desc.length == 2)
    assert(ConstraintCatalog.primaryKey("orders").exists(_.rely))
    // FK without RELY is recorded but not relied upon
    assert(ConstraintCatalog.foreignKeys("lineitem", "orders").exists(!_.rely))
    // Hive 2.1 rejects ENABLE (BaseSemanticAnalyzer: "not supported yet")
    intercept[IllegalArgumentException] {
      ConstraintDdl.run("ALTER TABLE orders ADD CONSTRAINT pk2 PRIMARY KEY (o_orderkey) ENABLE")
    }
    ConstraintDdl.run("ALTER TABLE lineitem DROP CONSTRAINT fk_lo")
    assert(ConstraintCatalog.foreignKeys("lineitem", "orders").isEmpty)
    ConstraintDdl.run("ALTER TABLE orders DROP CONSTRAINT pk_orders")
    assert(ConstraintCatalog.primaryKey("orders").isEmpty)
    ConstraintCatalog.clear()
  }

  test("inner FK->PK join with unreferenced dim side is eliminated, answer preserved") {
    // NB: queryExecution is a lazy val — build a FRESH frame on each side
    // of the registration, or the cached pre-constraint plan is compared.
    def joined = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
    ConstraintCatalog.clear()
    val baseline = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    withTpchConstraints() {
      val post = joined
      val opt = optimized(post)
      assert(!opt.contains("Join"), "FK->PK inner join must be eliminated:\n" + opt)
      assert(opt.toLowerCase.contains("isnotnull(l_orderkey"),
        "elimination must keep the null-key filter:\n" + opt)
      val got = post.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == baseline, "eliminated join changed the answer")
    }
  }

  test("left-outer join onto a PK with unreferenced dim side is eliminated without an FK") {
    withTpchConstraints() {
      // note: no FK from orders to customer is declared — uniqueness suffices
      val df = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"), "left_outer")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val opt = optimized(df)
      assert(!opt.contains("Join"), "left-outer PK join must be eliminated:\n" + opt)
      // no IS NOT NULL inserted on the left-outer path (all rows survive)
      assert(!opt.toLowerCase.contains("isnotnull(o_custkey"), opt)
    }
  }

  test("inner join without a declared FK is NOT eliminated") {
    withTpchConstraints() {
      // customer PK exists, but no FK orders->customer is declared
      val df = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      assert(optimized(df).contains("Join"), "inner join needs a RELY FK to eliminate")
    }
  }

  test("NORELY constraints never fire; referenced dim columns block elimination") {
    withTpchConstraints(rely = false) {
      val df = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      assert(optimized(df).contains("Join"), "NORELY must not license elimination")
    }
    withTpchConstraints() {
      val referenced = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      assert(optimized(referenced).contains("Join"),
        "dim column referenced above the join — must not eliminate")
      val filteredDim = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf).filter(col("o_totalprice") > 1000.0),
              col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      assert(optimized(filteredDim).contains("Join"),
        "filtered dim side changes the match set — must not eliminate")
    }
  }

  test("DISTINCT covering the PK is deleted; partial-PK distinct is kept") {
    withTpchConstraints() {
      val covering = Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus")).distinct()
      val opt = optimized(covering)
      assert(!opt.contains("Aggregate") && !opt.contains("Deduplicate"),
        "distinct over PK-carrying projection must be deleted:\n" + opt)
      assert(covering.count() == Tables.orders(spark, sf).count())

      val partial = Tables.orders(spark, sf)
        .select(col("o_custkey"), col("o_orderstatus")).distinct()
      assert(optimized(partial).contains("Aggregate"),
        "distinct NOT covering the PK must be kept")
      // and it actually dedupes
      assert(partial.count() < Tables.orders(spark, sf).count())
    }
  }

  test("distinct elimination traces through filters but not through renames") {
    withTpchConstraints() {
      val throughFilter = Tables.orders(spark, sf)
        .filter(col("o_totalprice") > 0)
        .select(col("o_orderkey"), col("o_orderstatus")).distinct()
      assert(!optimized(throughFilter).contains("Aggregate"))

      val renamed = Tables.orders(spark, sf)
        .select(col("o_orderkey").as("k"), col("o_orderstatus")).distinct()
      assert(optimized(renamed).contains("Aggregate"),
        "renamed key stops the conservative trace (documented)")
    }
  }

  test("COUNT(DISTINCT pk) drops its DISTINCT; non-key and joined cases keep it") {
    withTpchConstraints() {
      val onPk = Tables.orders(spark, sf)
        .agg(count_distinct(col("o_orderkey")).as("n"))
      val opt = optimized(onPk)
      assert(!opt.contains("distinct"),
        "count(distinct pk) over the bare scan must lose its DISTINCT:\n" + opt)
      assert(onPk.collect()(0).getLong(0) == Tables.orders(spark, sf).count())

      val onNonKey = Tables.orders(spark, sf)
        .agg(count_distinct(col("o_custkey")).as("n"))
      assert(optimized(onNonKey).contains("distinct"),
        "count(distinct non-key) must keep its DISTINCT")

      // below a join the key can repeat: DISTINCT must survive
      val joined = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .agg(count_distinct(col("o_orderkey")).as("n"))
      assert(optimized(joined).contains("distinct"),
        "count(distinct pk) above a fact join counts deduped keys — must keep DISTINCT")
    }
  }

  test("a derived copy sharing the table's basename never licenses a rewrite") {
    withTpchConstraints() {
      // duplicated keys in a file whose BASENAME matches the registered
      // table: if identity were by basename alone, DISTINCT elimination
      // would silently return duplicates
      val copyDir = "target/storage/constraints_spec/orders.parquet"
      val half = Tables.orders(spark, sf).limit(100)
      half.union(half).write.mode("overwrite").parquet(copyDir)
      val q = spark.read.parquet(copyDir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus")).distinct()
      assert(optimized(q).contains("Aggregate"),
        "DISTINCT must survive on a non-registered copy:\n" + optimized(q))
      assert(q.count() == 100)
      // and a multi-root scan mixing the true table with the copy also
      // declines (identity requires a single verified root)
      val multi = spark.read.parquet(
          s"$sf/orders.parquet", copyDir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus")).distinct()
      assert(optimized(multi).contains("Aggregate"))
    }
  }

  test("resolution cache: constraint re-registration is the refresh point for a moved name") {
    val moved = "target/storage/constraints_spec/orders"
    try withTpchConstraints() {
      def distinctOnOld = Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus")).distinct()
      // fires — and the verified name->location binding is now cached
      assert(!optimized(distinctOnOld).contains("Aggregate"))
      // re-point the NAME at a copy (same basename, different location)
      Tables.orders(spark, sf).write.mode("overwrite").parquet(moved)
      spark.read.parquet(moved).createOrReplaceTempView("orders")
      // the documented refresh point: any constraint mutation invalidates
      ConstraintDdl.run("ALTER TABLE orders ADD CONSTRAINT pk_orders PRIMARY KEY (o_orderkey) DISABLE NOVALIDATE RELY")
      // the old location is no longer what the session calls `orders`:
      // a stale cached binding here would delete a live DISTINCT
      assert(optimized(distinctOnOld).contains("Aggregate"),
        "stale resolution cache licensed a rewrite on a moved-away location")
      // and the new location now verifies, so the rewrite follows the name
      val onNew = spark.read.parquet(moved)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus")).distinct()
      assert(!optimized(onNew).contains("Aggregate"))
    } finally Tables.registerAll(spark, sf) // restore the shared temp views
  }

  test("empty registry is an exact no-op on a join-heavy plan") {
    ConstraintCatalog.clear()
    val df = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    val before = df.queryExecution.optimizedPlan
    assert(ConstraintRewrites(before) fastEquals before)
  }
}
