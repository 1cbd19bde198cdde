package graft.tools

import org.apache.spark.sql.functions._
import graft.Session

/** Ad-hoc timing probe for the q123 pipeline phases (not part of the
  * driver contract; run with runMain graft.tools.CcProbe <sfDir>). */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Session.local()
    import graft.operators.Dedup._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = graft.Tables.documents(spark, sfDir)
    // warmup scan
    docs.write.format("noop").mode("overwrite").save()

    val shRaw = shingleHashes(docs)
    val cands = time("lshCandidates (count)") {
      val c = lshCandidates(minhashSignatures(shRaw, k = 32), bands = 8); c.write.format("noop").mode("overwrite").save(); c
    }
    val edges = time("exactJaccard verify (noop)") {
      val e = exactJaccard(cands, shRaw, keepZero = false)
        .filter(col("jac") >= 0.7).select(col("ida"), col("idb"))
      e.write.format("noop").mode("overwrite").save(); e
    }
    val labels = time("connectedComponents") { connectedComponents(edges) }
    time("cluster agg + orderBy") {
      labels.groupBy(col("comp"))
        .agg(count(lit(1)).as("n_members"), max(col("id")).as("max_id"))
        .orderBy(col("comp")).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
