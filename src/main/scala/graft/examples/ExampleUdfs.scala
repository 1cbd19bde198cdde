package graft.examples

/** Example compiled UDFs — the `contrib/` module analog (reference
  * contrib/src/java/org/apache/hadoop/hive/contrib/udf/example/
  * UDFExampleAdd.java:28, UDFExampleFormat.java): plain classes
  * following the exec/UDF.java convention (public `evaluate` overloads,
  * no framework types), deployable with
  * `CREATE TEMPORARY FUNCTION f AS 'graft.examples.ExampleAddUdf'`
  * and exercised by q298 + UdfDeploySpec. Users ship their own classes
  * the same way, via the application jar. */
class ExampleAddUdf {
  def evaluate(a: Double, b: Double): Double = a + b
  def evaluate(a: Int, b: Int): Int = a + b
}

/** String-shape example: digits collapse to '#' (a redaction-flavored
  * twin of UDFExampleFormat's printf). Boxed String parameter, so a
  * null flows IN (the class handles it) rather than short-circuiting. */
class ExampleRedactDigitsUdf {
  def evaluate(s: String): String =
    if (s == null) null else s.replaceAll("[0-9]", "#")
}
