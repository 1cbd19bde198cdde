package graft.operators

import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.plans.Asof

/** Queries for the custom AS-OF JOIN operator (graft.plans.AsofJoin —
  * logical node + strategy + sort-merge exec injected through
  * GraftExtensions). The oracle is DuckDB's native `ASOF LEFT JOIN`,
  * which pins the operator's semantics hash-exactly: latest right row
  * per left row with matching key and right time <= left time.
  *
  * Outputs project the matched TIME (not the matched row id), so results
  * are hash-stable even if several right rows tie on the maximal time.
  */
object AsofOps {

  private def purchasesAndViews(s: org.apache.spark.sql.SparkSession, d: String) = {
    val p = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val v = Tables.events(s, d)
      .filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("last_view_ts"))
    (p, v)
  }

  /** View→purchase attribution: each purchase joined to the user's most
    * recent prior (or simultaneous) view; gap in microseconds, null when
    * the user never viewed before buying. */
  val q125_asof_attribution: Q = (s, d) => {
    val (p, v) = purchasesAndViews(s, d)
    Asof.join(p, v, Seq("user_id"), Seq("v_user"), "p_ts", "last_view_ts")
      .select(col("purchase_id"), col("user_id"), col("last_view_ts"),
        (unix_micros(col("p_ts")) - unix_micros(col("last_view_ts"))).as("gap_us"))
      .orderBy(col("purchase_id"))
  }

  /** Same join under a 24h tolerance: a view older than the window no
    * longer attributes the purchase (both right columns go null). */
  val q126_asof_tolerance: Q = (s, d) => {
    val (p, v) = purchasesAndViews(s, d)
    Asof.join(p, v, Seq("user_id"), Seq("v_user"), "p_ts", "last_view_ts",
        toleranceUs = Some(24L * 3600 * 1000 * 1000))
      .select(col("purchase_id"), col("user_id"), col("last_view_ts"),
        (unix_micros(col("p_ts")) - unix_micros(col("last_view_ts"))).as("gap_us"))
      .orderBy(col("purchase_id"))
  }

  /** Composite-key as-of: latest SAME-DAY prior view per purchase — the
    * key is (user_id, day), exercising the multi-column ClusteredDistribution
    * and the lexicographic key compare in the merge. A view from an
    * earlier day no longer attributes (both right columns null), unlike
    * q125 where any prior view matches. */
  val q136_asof_multikey: Q = (s, d) => {
    val p = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        to_date(col("ts")).as("p_day"), col("ts").as("p_ts"))
    val v = Tables.events(s, d)
      .filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), to_date(col("ts")).as("v_day"),
        col("ts").as("last_view_ts"))
    Asof.join(p, v, Seq("user_id", "p_day"), Seq("v_user", "v_day"),
        "p_ts", "last_view_ts")
      .select(col("purchase_id"), col("user_id"), col("last_view_ts"),
        (unix_micros(col("p_ts")) - unix_micros(col("last_view_ts"))).as("gap_us"))
      .orderBy(col("purchase_id"))
  }

  val queries: Map[String, Q] = Map(
    "q125_asof_attribution" -> q125_asof_attribution,
    "q126_asof_tolerance" -> q126_asof_tolerance,
    "q136_asof_multikey" -> q136_asof_multikey,
  )

  // events.parquet carries TIMESTAMP(NANOS); both engines truncate to
  // micros (see TESTDATA.md + Tables.events) so timestamps hash equal.
  private val eventsCte =
    """e AS (SELECT event_id, user_id, event_type,
      |  make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q125_asof_attribution" ->
      s"""WITH $eventsCte,
         |p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts FROM e
         |      WHERE event_type = 'purchase'),
         |v AS (SELECT user_id AS v_user, ts AS last_view_ts FROM e
         |      WHERE event_type = 'view')
         |SELECT purchase_id, user_id, last_view_ts,
         |       epoch_us(p_ts) - epoch_us(last_view_ts) AS gap_us
         |FROM p ASOF LEFT JOIN v
         |  ON p.user_id = v.v_user AND v.last_view_ts <= p.p_ts
         |ORDER BY purchase_id""".stripMargin,
    "q126_asof_tolerance" ->
      s"""WITH $eventsCte,
         |p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts FROM e
         |      WHERE event_type = 'purchase'),
         |v AS (SELECT user_id AS v_user, ts AS last_view_ts FROM e
         |      WHERE event_type = 'view'),
         |a AS (SELECT purchase_id, user_id, last_view_ts,
         |        epoch_us(p_ts) - epoch_us(last_view_ts) AS gap_us
         |      FROM p ASOF LEFT JOIN v
         |        ON p.user_id = v.v_user AND v.last_view_ts <= p.p_ts)
         |SELECT purchase_id, user_id,
         |  CASE WHEN gap_us <= 86400000000 THEN last_view_ts END AS last_view_ts,
         |  CASE WHEN gap_us <= 86400000000 THEN gap_us END AS gap_us
         |FROM a ORDER BY purchase_id""".stripMargin,
    "q136_asof_multikey" ->
      s"""WITH $eventsCte,
         |p AS (SELECT event_id AS purchase_id, user_id,
         |        CAST(ts AS DATE) AS p_day, ts AS p_ts FROM e
         |      WHERE event_type = 'purchase'),
         |v AS (SELECT user_id AS v_user, CAST(ts AS DATE) AS v_day,
         |        ts AS last_view_ts FROM e
         |      WHERE event_type = 'view')
         |SELECT purchase_id, user_id, last_view_ts,
         |       epoch_us(p_ts) - epoch_us(last_view_ts) AS gap_us
         |FROM p ASOF LEFT JOIN v
         |  ON p.user_id = v.v_user AND p.p_day = v.v_day
         |  AND v.last_view_ts <= p.p_ts
         |ORDER BY purchase_id""".stripMargin,
  )
}
