package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** MatchPath — the reference's symbol-pattern PTF
  * (ql/src/java/org/apache/hadoop/hive/ql/udf/ptf/MatchPath.java:81, a
  * primitive MATCH_RECOGNIZE): find, per partition key, event
  * subsequences whose symbols match a pattern. Implemented the Spark-
  * typed way SURVEY.md §2.5 prescribes: groupByKey + flatMapGroups with
  * an in-memory greedy matcher per key.
  *
  * Scale: state is one user's ordered events; keys are high-cardinality
  * users, so groups are small and the shuffle is one exchange on
  * user_id. For pathological single-key histories you'd swap in
  * secondary-sorted mapPartitions; the matcher itself is unchanged.
  */
object MatchPath {

  case class Ev(user_id: Long, event_id: Long, tsMicros: Long, event_type: String)
  case class PathMatch(user_id: Long, end_event_id: Long, n_views: Long)

  /** Matches of the pattern `view+ purchase` (>=1 consecutive views
    * immediately followed by a purchase), greedy-maximal. */
  def viewsThenPurchase(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val ds = events
      .select(col("user_id"), col("event_id"),
              unix_micros(col("ts")).as("tsMicros"), col("event_type"))
      .as[Ev]
    ds.groupByKey(_.user_id)
      .flatMapGroups { (uid, it) =>
        val evs = it.toArray.sortBy(e => (e.tsMicros, e.event_id))
        val out = scala.collection.mutable.ArrayBuffer.empty[PathMatch]
        var run = 0L
        evs.foreach { e =>
          e.event_type match {
            case "view" => run += 1
            case "purchase" =>
              if (run > 0) out += PathMatch(uid, e.event_id, run)
              run = 0
            case _ => run = 0
          }
        }
        out.iterator
      }
      .toDF()
  }

  /** Driver-contract query: all view+ purchase matches, with the run
    * length distribution stable for the oracle. */
  val q98_matchpath: Q = (s, d) => {
    viewsThenPurchase(s, Tables.events(s, d))
      .orderBy(col("user_id"), col("end_event_id"))
  }

  /** The reference's PTF invocation SYNTAX end to end: `from
    * matchpath(on T distribute by ... sort by ... argN(...))` through
    * [[MatchPathSql.rewrite]] (parse/PTFTranslator.java's clause,
    * udf/ptf/MatchPath.java's matcher) — pattern `V.P` = every
    * view-immediately-followed-by-purchase adjacency. */
  val q311_matchpath_sql: Q = (s, d) => {
    Tables.events(s, d).createOrReplaceTempView("mp_events")
    val sql =
      """select user_id, view_event_id, purchase_event_id
        |from matchpath(on mp_events
        |    distribute by user_id
        |    sort by ts, event_id
        |  arg1('V.P'),
        |  arg2('V'), arg3(event_type = 'view'),
        |  arg4('P'), arg5(event_type = 'purchase'),
        |  arg6('user_id, event_id as view_event_id,
        |        tpath[1].event_id as purchase_event_id'))
        |order by user_id, view_event_id""".stripMargin
    s.sql(MatchPathSql.rewrite(s, sql))
  }

  val queries: Map[String, Q] = Map(
    "q98_matchpath" -> q98_matchpath,
    "q311_matchpath_sql" -> q311_matchpath_sql)

  /** The same matches via gaps-and-islands SQL: for each purchase, the
    * count of consecutive 'view' rows immediately before it. */
  val oracles: Map[String, String] = Map(
    "q98_matchpath" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY make_timestamp(epoch_ns(ts) // 1000), event_id) AS rn
        |  FROM events),
        |v AS (
        |  SELECT user_id, event_id, event_type, rn,
        |    rn - COALESCE(MAX(CASE WHEN event_type <> 'view' THEN rn END)
        |           OVER (PARTITION BY user_id ORDER BY rn
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) - 1
        |      AS n_views
        |  FROM e)
        |SELECT user_id, event_id AS end_event_id, CAST(n_views AS BIGINT) AS n_views
        |FROM v
        |WHERE event_type = 'purchase' AND n_views > 0
        |ORDER BY user_id, end_event_id""".stripMargin,
    "q311_matchpath_sql" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY make_timestamp(epoch_ns(ts) // 1000), event_id) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id, event_id, event_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY rn) AS nt,
        |    LEAD(event_id) OVER (PARTITION BY user_id ORDER BY rn) AS nid
        |  FROM e)
        |SELECT user_id, event_id AS view_event_id, nid AS purchase_event_id
        |FROM p WHERE event_type = 'view' AND nt = 'purchase'
        |ORDER BY user_id, view_event_id""".stripMargin,
  )
}
