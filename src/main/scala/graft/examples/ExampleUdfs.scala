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

/** The partial state an aggregate ships between map and reduce — the
  * UDAFAvgState analog (contrib/.../udaf/example/UDAFExampleAvg.java:47:
  * `{ long mCount; double mSum; }`). Must be Serializable: this object
  * IS the shuffle payload. */
class ExampleAvgState(var count: Long, var sum: Double) extends Serializable

/** Example compiled UDAF following the exec/UDAF.java evaluator
  * convention (contrib UDAFExampleAvg.java:60): init/iterate/
  * terminatePartial/merge/terminate, deployed with the same
  * `CREATE TEMPORARY FUNCTION f AS 'class'` DDL — the deployed shape is
  * auto-detected. Sum and count are exact over integral-valued inputs,
  * so the single terminate-time division is deterministic at any
  * partitioning (the gate row relies on this). */
class ExampleAvgUdaf {
  private var count: Long = 0L
  private var sum: Double = 0.0
  def init(): Unit = { count = 0L; sum = 0.0 }
  def iterate(v: java.lang.Double): Boolean = {
    if (v != null) { count += 1; sum += v.doubleValue() }; true
  }
  def terminatePartial(): ExampleAvgState = new ExampleAvgState(count, sum)
  def merge(p: ExampleAvgState): Boolean = {
    if (p != null) { count += p.count; sum += p.sum }; true
  }
  def terminate(): java.lang.Double =
    if (count == 0L) null else java.lang.Double.valueOf(sum / count)
}

/** Order-invariant string max — the UDAFExampleMax shape with a String
  * partial (a Serializable primitive, the simplest legal partial). */
class ExampleMaxUdaf {
  private var cur: String = null
  def init(): Unit = { cur = null }
  def iterate(v: String): Boolean = {
    if (v != null && (cur == null || v.compareTo(cur) > 0)) cur = v; true
  }
  def terminatePartial(): String = cur
  def merge(p: String): Boolean = iterate(p)
  def terminate(): String = cur
}

/** Example compiled UDTF following the GenericUDTF convention
  * (ql/udf/generic/GenericUDTF.java; contrib GenericUDTFCount2.java):
  * initialize() declares the output shape (DDL text standing in for the
  * StructObjectInspector), process() returns the rows it would forward.
  * Splits a string and emits (pos, token) — the explode2 flavor. */
class ExampleSplitUdtf {
  def initialize(): String = "pos INT, token STRING"
  def process(s: String, delim: String): java.lang.Iterable[Array[AnyRef]] = {
    if (s == null || delim == null) return java.util.Collections.emptyList()
    val out = new java.util.ArrayList[Array[AnyRef]]()
    var pos = 0
    s.split(java.util.regex.Pattern.quote(delim), -1).foreach { tok =>
      out.add(Array[AnyRef](Integer.valueOf(pos), tok)); pos += 1
    }
    out
  }
}
