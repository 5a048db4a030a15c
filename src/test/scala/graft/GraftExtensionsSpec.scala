package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.plans.{GraftExtensions, RewriteDotProduct}

/** Tests for the optimizer rewrite and the SQL function injection. */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private val hofDotDf = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))).toDF("a", "b")
    .select(aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0L), (acc, v) => acc + v).as("d"))

  test("RewriteDotProduct rewrites the HOF pattern to QuantizedDot") {
    val analyzed = hofDotDf.queryExecution.analyzed
    val rewritten = RewriteDotProduct(analyzed)
    val found = rewritten.expressions.exists(_.find {
      case _: org.apache.spark.sql.graft.QuantizedDot => true
      case _ => false
    }.isDefined)
    assert(found, s"no QuantizedDot in:\n$rewritten")
  }

  test("rewrite preserves the result value") {
    val direct = hofDotDf.as[Long].head()
    assert(direct == 1 * 4 + 2 * 5 + 3 * 6)
    val viaExpr = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))).toDF("a", "b")
      .select(org.apache.spark.sql.graft.QuantizedDot($"a", $"b").as("d")).as[Long].head()
    assert(viaExpr == direct)
  }

  test("extensions session: SQL quantized_dot + automatic rewrite") {
    val old = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql("SELECT quantized_dot(array(2L, 3L), array(10L, 20L)) AS d")
        .collect().head.getLong(0)
      assert(r == 2 * 10 + 3 * 20)
      // the HOF formulation now optimizes to QuantizedDot inside s2
      // (non-literal inputs, else constant folding erases the pattern)
      val df = s2.range(5)
        .selectExpr("id", "array(id, id + 1) AS a", "array(id * 2, id * 3) AS b")
        .selectExpr("id", "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v) AS d")
      assert(df.queryExecution.optimizedPlan.toString.toLowerCase.contains("quantizeddot"))
      val rows = df.collect().map(r0 => r0.getLong(0) -> r0.getLong(1)).toMap
      assert(rows(2L) == 2 * 4 + 3 * 6) // id=2: [2,3]·[4,6]
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }
}
