package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation — the engine-level counterpart of the
  * reference's compile-time skew join (optimizer/SkewJoinOptimizer.java,
  * exec/SkewJoinHandler.java:74). AQE covers runtime-detected skew
  * (ScaleSpec pins it); when hot keys are KNOWN ahead of time, explicit
  * salting is cheaper: spread the big side's rows over `salts` buckets
  * and replicate the small side across every bucket, so no single
  * reducer ever receives a hot key's full row set. The output is
  * row-identical to the unsalted equi-join — only the shuffle
  * distribution changes, which is the whole point at 100 TB.
  */
object SkewTools {

  /** Equi-join a large skewed `left` with a small `right` on `key`,
    * salted `salts` ways. Cost: `right` is replicated x salts (keep it
    * the broadcast-sized side); benefit: the hot key's rows split across
    * `salts` reducers instead of one.
    *
    * The salt derives DETERMINISTICALLY from row content (xxhash64 over
    * every left column), not from monotonically_increasing_id: a
    * nondeterministic expression feeding a shuffle marks the stage
    * indeterminate, so a shuffle-fetch failure forces Spark to roll back
    * and recompute the whole stage rather than just the lost partitions.
    * A hot key's rows normally differ in their other columns, so the
    * content hash spreads them across salt buckets. The one shape it
    * cannot spread is BYTE-IDENTICAL duplicate rows (every copy hashes
    * to the same bucket) — exact-dedup such input first, or rely on
    * AQE's skew-join split (Session enables it), which divides by
    * partition size rather than row content. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val sl = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(salts.toLong)).cast("int"))
    val sr = right.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    sl.join(sr, Seq(key, "__salt")).drop("__salt")
  }
}
