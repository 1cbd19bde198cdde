package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Bucketed range join — point-in-interval joins WITHOUT a selective
  * equi-key (the reference reaches these through plain theta joins,
  * which plan as nested-loop: `ql/src/java/org/apache/hadoop/hive/ql/
  * optimizer/physical/` has no interval strategy, and Spark's own
  * planner falls back to BroadcastNestedLoopJoin the same way).
  *
  * The classic fix, composed from existing operators rather than a new
  * physical node: quantize time into fixed-width buckets, explode each
  * interval into the buckets it covers, equi-join points to intervals
  * on the bucket id, and re-apply the exact range predicate. Cost drops
  * from O(|points| x |intervals|) to
  * O(|points| + |intervals| x ceil(span/width) + |true matches|), and
  * the join is a shuffled/broadcast HASH join that AQE can skew-split —
  * the 100 TB shape. Pick `widthMicros` near the median interval span
  * so most intervals explode into ~1-2 buckets.
  *
  * Bucket math is done in microseconds (Spark timestamps are micros),
  * and the last covered bucket uses `end - 1us` so exclusive ends never
  * leak an extra bucket and fractional-width ends never miss one.
  */
object RangeJoin {

  /** Join `points` (event time `ts`) to `intervals` ([start, end),
    * end-exclusive) via bucket equi-join + exact re-filter. Column
    * names of `ts`/`start`/`end` must be distinct between the two
    * inputs (they are resolved by name after the join). `extraKeys`
    * adds equi-columns shared by both sides (e.g. a tenant id) to the
    * join key, tightening the hash lookup for free. */
  def bucketed(points: DataFrame, ts: Column,
               intervals: DataFrame, start: Column, end: Column,
               widthMicros: Long, extraKeys: Seq[String] = Nil): DataFrame = {
    require(widthMicros > 0, s"widthMicros must be positive: $widthMicros")
    val p = points.withColumn("__bkt", floor(unix_micros(ts) / widthMicros))
    val i = intervals.withColumn("__bkt", explode(sequence(
      floor(unix_micros(start) / widthMicros),
      floor((unix_micros(end) - 1) / widthMicros))))
    p.join(i, Seq("__bkt") ++ extraKeys)
      .filter(ts >= start && ts < end)
      .drop("__bkt")
  }

  /** Gate row: hot-window attribution. Hot windows are (event_type,
    * day) cells with >= 70 events; every event landing inside another
    * type's hot window is attributed to it, rolled up per (event_type,
    * w_type). Intervals are 1-day spans over 1-hour buckets, so each
    * interval explodes into 24 buckets and the multi-bucket path is
    * exercised; the join itself is a broadcast HASH join (the window
    * sliver is tiny), never a nested loop. */
  val q236_range_join_hot: Q = (s, d) => {
    val ev = Tables.events(s, d).select(col("event_id"), col("event_type"), col("ts"))
    val hot = ev.groupBy(col("event_type").as("w_type"),
                         date_trunc("day", col("ts")).as("w_start"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 70)
      .select(col("w_type"), col("w_start"),
              (col("w_start") + expr("INTERVAL 1 DAY")).as("w_end"))
    bucketed(ev, col("ts"), hot, col("w_start"), col("w_end"),
             widthMicros = 3600L * 1000000L)
      .filter(col("event_type") =!= col("w_type"))
      .groupBy(col("event_type"), col("w_type"))
      .agg(count(lit(1)).as("n_hits"))
      .orderBy(col("event_type"), col("w_type"))
  }

  val queries: Map[String, Q] = Map(
    "q236_range_join_hot" -> q236_range_join_hot,
  )

  val oracles: Map[String, String] = Map(
    "q236_range_join_hot" ->
      """WITH e AS (
        |  SELECT event_id, event_type, make_timestamp(epoch_ns(ts) // 1000) AS ts
        |  FROM events),
        |w AS (
        |  SELECT event_type AS w_type,
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS w_start,
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY AS w_end
        |  FROM e GROUP BY 1, 2 HAVING count(1) >= 70)
        |SELECT e.event_type, w.w_type, count(1) AS n_hits
        |FROM e JOIN w ON e.ts >= w.w_start AND e.ts < w.w_end
        |  AND e.event_type <> w.w_type
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
