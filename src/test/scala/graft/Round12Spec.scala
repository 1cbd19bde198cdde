package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{HiveDecimalArith, HiveDateTimeShims}

/** Pins for the round-12 compat semantics, derived BY HAND from the
  * reference sources (not from running the corpus), so a regression in
  * the rules is caught without the replay:
  *
  *  - Hive 2.1 decimal DIVISION result-type derivation
  *    (GenericUDFOPDivide.deriveResultDecimalTypeInfo:118) including
  *    the shrink-with-negative-bias branch and constant-digit operand
  *    precision; AVG's (p−s)+min(s+4, 38−(p−s))
  *    (GenericUDAFAverage.java:229).
  *  - the date/time string-parse shims (lenient SimpleDateFormat roll,
  *    strict Timestamp.valueOf gate) driving
  *    add_months/last_day/quarter/trunc/months_between.
  *  - the reference-formula variance family's single-element rule
  *    (GenericUDAFVarianceSample.terminate: one element is 0, never
  *    NULL) and the exact iterate arithmetic on a fixed set.
  *  - UDFRand's per-task java.util.Random(seed) draw.
  */
class Round12Spec extends AnyFunSuite {
  import TestSession._

  test("Hive divide type derivation: shrink with negative bias") {
    // sum(decimal(20,10)) = (30,10) over count bigint (19,0):
    // intDig=20, decDig=30, over by 12 -> decDig -= 12/2+1 = 23
    assert(HiveDecimalArith.divideType(30, 10, 19, 0) ==
      org.apache.spark.sql.types.DecimalType(38, 23))
    // key decimal(20,10) / literal 4 (constant digits: p2=1):
    // intDig=10, decDig=max(6, 10+1+1)=12 -> (22,12)
    assert(HiveDecimalArith.divideType(20, 10, 1, 0) ==
      org.apache.spark.sql.types.DecimalType(22, 12))
    // small operands keep the unshrunk derivation
    assert(HiveDecimalArith.divideType(10, 2, 5, 1) ==
      org.apache.spark.sql.types.DecimalType(17, 8))
  }

  test("Hive avg type derivation caps scale before integer digits") {
    assert(HiveDecimalArith.avgType(20, 10) ==
      org.apache.spark.sql.types.DecimalType(24, 14))
    // p+4 would pass 38: scale gives way, intPart is kept
    assert(HiveDecimalArith.avgType(38, 18) ==
      org.apache.spark.sql.types.DecimalType(38, 18))
  }

  test("lenient date roll and strict timestamp gate") {
    // DateUtils.getDateFormat is LENIENT: invalid fields roll
    assert(HiveDateTimeShims.lenientDateDays("2014-01-34") ==
      Some(java.time.LocalDate.of(2014, 2, 3).toEpochDay.toInt))
    // trailing text after the date is ignored (SDF ParsePosition)
    assert(HiveDateTimeShims.lenientDateDays("2014-01-31 10:30:00") ==
      Some(java.time.LocalDate.of(2014, 1, 31).toEpochDay.toInt))
    // non-matching prefixes fail (null in the reference)
    assert(HiveDateTimeShims.lenientDateDays("01/14/2014").isEmpty)
    // months_between's timestamp lane wants SECONDS — '10:39' is not a
    // timestamp there and falls back to the date parse
    assert(HiveDateTimeShims.strictTimestamp("1995-02-02 10:39").isEmpty)
    assert(HiveDateTimeShims.strictTimestamp("1995-02-02 10:39:00").isDefined)
  }

  test("reference variance formulas: single element is 0, not NULL") {
    val s = spark.newSession() // own registry: the pins must not leak
    import s.implicits._
    graft.functions.HiveVariance.register(s)
    val one = Seq(5.0).toDF("x").coalesce(1)
    val r = one.selectExpr("var_samp(x)", "stddev_samp(x)", "var_pop(x)",
      "variance(x)").collect()(0)
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0 &&
      r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0)
    // fixed set, single partition: the reference's running formula
    // (t = count·v − sum; var += t²/(count·(count−1))) exactly
    val xs = Seq(1.0, 2.0, 3.0, 4.0)
    var count = 0L; var sum = 0.0; var variance = 0.0
    xs.foreach { v =>
      count += 1; sum += v
      if (count > 1) { val t = count * v - sum
        variance += (t * t) / (count.toDouble * (count - 1)) }
    }
    val got = xs.toDF("x").coalesce(1)
      .selectExpr("variance(x)").collect()(0).getDouble(0)
    assert(got == variance / count)
  }

  test("seeded rand draws the reference's java.util.Random sequence") {
    val s = spark.newSession()
    import s.implicits._
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hive_rand_t", _ => graft.functions.HiveRand(3L), "scala_udf")
    val first = Seq(1).toDF("x").coalesce(1)
      .selectExpr("hive_rand_t()").collect()(0).getDouble(0)
    assert(first == 0.731057369148862) // new java.util.Random(3).nextDouble()
  }
}
