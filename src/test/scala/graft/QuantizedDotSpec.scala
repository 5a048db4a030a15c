package graft

import org.apache.spark.sql.functions._

/** Property-style test (seeded random cases): the native codegen'd
  * QuantizedDot must agree with the built-in HOF formulation and a
  * plain Scala reference on arbitrary long arrays, including unequal
  * lengths and empties.
  */
class QuantizedDotSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  test("QuantizedDot equals HOF + Scala reference on 100 random cases") {
    val rnd = new scala.util.Random(42)
    val cases = (1 to 100).map { _ =>
      val n = rnd.nextInt(80)
      val m = if (rnd.nextBoolean()) n else rnd.nextInt(80)
      (Seq.fill(n)(rnd.nextLong() % 100000), Seq.fill(m)(rnd.nextLong() % 100000))
    }
    val df = cases.toDF("a", "b")
    val got = df.select(org.apache.spark.sql.graft.QuantizedDot($"a", $"b")).as[Long].collect()
    cases.zip(got).foreach { case ((a, b), native) =>
      val k = math.min(a.length, b.length)
      val expected = (0 until k).foldLeft(0L)((s, i) => s + a(i) * b(i))
      assert(native == expected, s"native=$native expected=$expected n=${a.length} m=${b.length}")
    }
    // equal-length cases must also match the HOF formulation exactly
    val eq = cases.filter { case (a, b) => a.length == b.length }
    val dfe = eq.toDF("a", "b")
    val native = dfe.select(org.apache.spark.sql.graft.QuantizedDot($"a", $"b")).as[Long].collect()
    val hof = dfe.select(hofDot($"a", $"b")).as[Long].collect()
    assert(native.sameElements(hof))
  }

  test("QuantizedDot null propagation") {
    val df = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]])).toDF("a", "b")
    assert(df.select(org.apache.spark.sql.graft.QuantizedDot($"a", $"b")).head().isNullAt(0))
  }
}
