package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-14 semantics, derived BY HAND from the reference
  * sources (not from replaying the corpus):
  *
  *  - ngrams/context_ngrams are SQL-callable aggregates with the
  *    reference's array<struct<ngram,estfrequency>> result shape
  *    (FunctionRegistry.java:398-399) and (freq desc, ngram asc,
  *    length asc) final order (NGramEstimator.getNGrams:104-121);
  *    SQL-standard NULL for zero elements (getNGrams:97); n-grams
  *    never cross inner-array boundaries (GenericUDAFnGrams
  *    iterate:306-334); context arrays must contain a null
  *    (GenericUDAFContextNGrams iterate:225-235).
  *  - std/variance(DISTINCT x) in the compat dialect folds the
  *    de-duplicated values IN ASCENDING ORDER with the exact
  *    GenericUDAFVariance running formula (iterate:183-192) — the
  *    reference's distinct values are its sorted reduce keys, so the
  *    double stream is reproducible to the last ulp; var_pop divides
  *    by count, var_samp by count-1, a single element yields 0.0 and
  *    none yields NULL (terminate:227-238). Engine sessions keep
  *    Spark's distinct planning.
  */
class Round14Spec extends AnyFunSuite {
  import TestSession._

  private lazy val compat = {
    val s = spark.newSession()
    s.conf.set("graft.compat.hive.coercion", "true")
    graft.functions.HiveVariance.register(s)
    s
  }

  test("ngrams SQL form: exact counts, tie order, struct shape") {
    // seq = [a b a b c]; bigrams (any window order): {a b}x2, {b a}x1,
    // {b c}x1 — sorted (freq desc, ngram asc): [a,b] then [b,a] then
    // [b,c] (hand-derived)
    val r = spark.sql(
      "SELECT ngrams(array(array('a','b','a','b','c')), 2, 3) AS g")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(r.map(x => (x.getSeq[String](0).mkString(" "), x.getDouble(1))) ==
      Seq(("a b", 2.0), ("b a", 1.0), ("b c", 1.0)))
    // k truncates: top-1 keeps only the most frequent
    val r1 = spark.sql(
      "SELECT ngrams(array(array('a','b','a','b','c')), 2, 1) AS g")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(r1.length == 1 && r1.head.getSeq[String](0) == Seq("a", "b"))
    // n-grams never cross inner sequence boundaries: [[a,b],[b,c]] has
    // no [b,b] (iterate treats each inner array as its own sequence)
    val r2 = spark.sql(
      "SELECT ngrams(array(array('a','b'),array('b','c')), 2, 10) AS g")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(r2.map(_.getSeq[String](0).mkString(" ")).sorted == Seq("a b", "b c"))
    // estfrequency field extraction (the reference's invocation form)
    val ef = spark.sql(
      "SELECT ngrams(array(array('a','b','a','b','c')), 2, 3).estfrequency AS e")
      .collect().head.getSeq[Double](0)
    assert(ef == Seq(2.0, 1.0, 1.0))
    // SQL standard: zero elements -> NULL, not an empty array
    assert(spark.sql("SELECT ngrams(array(array('a')), 2, 3) AS g")
      .collect().head.isNullAt(0))
  }

  test("context_ngrams SQL form: filler slots and the null-context error") {
    // seq = [a b a b c], context ['b', null]: matches at the two 'b'
    // positions -> fillers 'a' (after first b) and 'c' (after second) —
    // wait, seq[1]=b -> filler seq[2]=a; seq[3]=b -> filler seq[4]=c;
    // counts a=1, c=1, tie order lexicographic
    val r = spark.sql(
      "SELECT context_ngrams(array(array('a','b','a','b','c')), " +
        "array('b', CAST(NULL AS STRING)), 5) AS g")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(r.map(x => (x.getSeq[String](0).mkString(" "), x.getDouble(1))) ==
      Seq(("a", 1.0), ("c", 1.0)))
    // a context with no null is rejected (the reference's analysis error)
    val e = intercept[Exception] {
      spark.sql("SELECT context_ngrams(array(array('a','b')), " +
        "array('a','b'), 5) AS g").collect()
    }
    assert(e.getMessage != null)
  }

  test("std/variance(DISTINCT) compat lane: exact ascending fold") {
    import compat.implicits._
    Seq(3.0, 1.0, 3.0, 2.0).toDF("x").createOrReplaceTempView("r14_v")
    // distinct {1,2,3} ascending through iterate:183-192:
    //   v=1: count=1 sum=1 var=0
    //   v=2: count=2 sum=3 t=2*2-3=1   var=0+1/(2*1)=0.5
    //   v=3: count=3 sum=6 t=3*3-6=3   var=0.5+9/(3*2)=2.0
    // var_pop=2/3, std=sqrt(2/3), var_samp=2/(3-1)=1.0 — exact doubles
    val row = compat.sql(
      "SELECT std(DISTINCT x), var_pop(DISTINCT x), var_samp(DISTINCT x) " +
        "FROM r14_v").collect().head
    assert(row.getDouble(0) == math.sqrt(2.0 / 3.0))
    assert(row.getDouble(1) == 2.0 / 3.0)
    assert(row.getDouble(2) == 1.0)
    // single distinct element -> 0.0 (terminate returns 0 for count==1)
    Seq(5.0, 5.0).toDF("x").createOrReplaceTempView("r14_v1")
    assert(compat.sql("SELECT std(DISTINCT x) FROM r14_v1")
      .collect().head.getDouble(0) == 0.0)
    // all-null input -> NULL
    Seq[Option[Double]](None, None).toDF("x").createOrReplaceTempView("r14_vn")
    assert(compat.sql("SELECT std(DISTINCT x) FROM r14_vn")
      .collect().head.isNullAt(0))
    // the ENGINE session keeps Spark's own distinct aggregate (no
    // compat conf): still answers, within float tolerance of the same
    // mathematical value
    locally {
      val se = spark
      import se.implicits._
      Seq(3.0, 1.0, 3.0, 2.0).toDF("x").createOrReplaceTempView("r14_ve")
      val engine = se.sql("SELECT stddev_pop(DISTINCT x) FROM r14_ve")
        .collect().head.getDouble(0)
      assert(math.abs(engine - math.sqrt(2.0 / 3.0)) < 1e-12)
    }
  }
}
