package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Session, Tables}
import graft.operators.Similarity

/** Ad-hoc stage timing of the sign-LSH (q111) pipeline. */
object ProbeSim {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Session.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[parts] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val bands = 16
    val bitsPerBand = 8
    val dim = 64
    val planesSeq = (0 until bands * bitsPerBand).map { j =>
      (0 until dim).map { i =>
        if (java.lang.Long.hashCode(scala.util.hashing.MurmurHash3
          .productHash((j + 1000, i))) % 2 == 0) 1.0 else -1.0
      }
    }
    val planes = typedLit(planesSeq)
    val bitsHof = transform(planes, p =>
      when(graft.functions.VectorOps.vector_dot(col("embedding"), p) >= 0,
        lit(1)).otherwise(lit(0)))
    // codegen'd alternative: 128 explicit vector_dot columns
    val bitsWide: Column = array((0 until bands * bitsPerBand).map { j =>
      when(graft.functions.VectorOps.vector_dot(col("embedding"),
        typedLit(planesSeq(j))) >= 0, lit(1)).otherwise(lit(0))
    }: _*)
    (1 to 2).foreach { pass =>
      println(s"[parts] ---- pass $pass ----")
      val base = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
      val eps = 0.08f
      val scaled = array((0 until dim).map { i =>
        col("embedding").getItem(i) *
          lit(if (i % 2 == 0) 1.0f + eps else 1.0f - eps)
      }: _*)
      val pair = array(
        struct(col("vec_id").as("vec_id"), col("embedding").as("embedding")),
        struct((col("vec_id") + lit(10000000L)).as("vec_id"), scaled.as("embedding")))
      val aug = base.select(explode(pair).as("r"))
        .select(col("r.vec_id").as("vec_id"), col("r.embedding").as("embedding"))
      time("embeddings scan")(noop(base))
      time("augmentWithTwins")(noop(aug))
      time("bits HOF-lambda")(noop(aug.select(col("vec_id"), bitsHof.as("bits"))))
      time("bits 128-wide")(noop(aug.select(col("vec_id"), bitsWide.as("bits"))))
      time("q111 full")(noop(
        Similarity.nearDupLsh(aug, 0.8).orderBy(col("ida"), col("idb"))))
      // replicate nearDupLsh internals for stage attribution
      val emb2 = aug
      val rawBanded = emb2.select(col("vec_id"), bitsHof.as("bits"))
        .select(col("vec_id"), explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            (0 until bitsPerBand).map(r =>
              element_at(col("bits"), b * bitsPerBand + r + 1) * (1 << r)).reduce(_ + _).as("bv"))
        }: _*)).as("bb"))
        .select(col("vec_id"), col("bb.band").as("band"), col("bb.bv").as("bv"))
      time("rawBanded")(noop(rawBanded))
      val stats = rawBanded.groupBy(col("band"), col("bv"))
        .agg(count(lit(1)).as("bsz"), min(col("vec_id")).as("minid"))
      time("stats")(noop(stats))
      val okBuckets = stats.filter(col("bsz") <= 4096).select(col("band"), col("bv"))
      val banded = rawBanded.join(okBuckets, Seq("band", "bv"), "left_semi")
      val pairwise = banded.as("a").join(banded.as("b"), Seq("band", "bv"))
        .where(col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("ida"), col("b.vec_id").as("idb"))
      val starred = rawBanded
        .join(stats.filter(col("bsz") > 4096).select(col("band"), col("bv"), col("minid")),
              Seq("band", "bv"))
        .where(col("vec_id") =!= col("minid"))
        .select(col("minid").as("ida"), col("vec_id").as("idb"))
      val candIds = pairwise.union(starred).distinct()
      time("pairwise pre-distinct count")(
        println("[parts] pre-distinct: " + pairwise.count()))
      time("candIds")(noop(candIds))
      println("[parts] candIds count: " + candIds.count())
      val va = emb2.select(col("vec_id").as("ida"), col("embedding").as("ea"))
      val vb = emb2.select(col("vec_id").as("idb"), col("embedding").as("eb"))
      time("verify join")(noop(candIds.join(va, Seq("ida")).join(vb, Seq("idb"))
        .withColumn("score", round(Similarity.cosine(col("ea"), col("eb")), 6))
        .filter(col("score") >= 0.8)
        .select(col("ida"), col("idb"), col("score"))))
    }
    spark.stop()
  }
}
