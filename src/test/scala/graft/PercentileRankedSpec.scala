package graft

import org.apache.spark.sql.functions._

/** The distributed-rank exact percentile (optimization round: replaces
  * the builtin `percentile` aggregate in x_approx_profile, whose
  * per-partition distinct-value hashmap measured 3.8 s alone at sf0.1)
  * must be BIT-equal to the builtin on every input shape: duplicates,
  * negatives, single element, integral positions, and the real price
  * column.
  */
class PercentileRankedSpec extends SparkSpec {
  import spark.implicits._

  private val qs = Seq("p0" -> 0.0, "p25" -> 0.25, "p50" -> 0.5,
    "p99" -> 0.99, "p100" -> 1.0)

  private def builtin(df: org.apache.spark.sql.DataFrame): Seq[Option[Double]] = {
    val r = df.agg(
      qs.map { case (n, q) => expr(s"percentile(v, ${q}D)").as(n) }.head,
      qs.map { case (n, q) => expr(s"percentile(v, ${q}D)").as(n) }.tail: _*).head()
    qs.indices.map(i => if (r.isNullAt(i)) None else Some(r.getDouble(i)))
  }

  private def ranked(df: org.apache.spark.sql.DataFrame): Seq[Option[Double]] = {
    val r = pipelines.AnalyticsQueries.exactPercentilesRanked(df.select("v"), qs).head()
    qs.indices.map(i => if (r.isNullAt(i)) None else Some(r.getDouble(i)))
  }

  test("ranked percentiles are bit-equal to the builtin") {
    val rnd = new scala.util.Random(11)
    val cases: Seq[Seq[Double]] = Seq(
      Seq(42.0),
      Seq(1.0, 2.0),
      Seq(5.0, 5.0, 5.0, 5.0),
      Seq.fill(101)(rnd.nextInt(7).toDouble), // heavy duplicates, integral positions
      Seq.fill(1000)(rnd.nextDouble() * 1e6 - 5e5),
      Seq.fill(9999)(rnd.nextGaussian() * 1e4))
    cases.zipWithIndex.foreach { case (vs, i) =>
      val df = vs.toDF("v")
      assert(ranked(df) == builtin(df), s"case $i (n=${vs.size})")
    }
  }

  test("nulls are dropped; all-null and empty inputs yield nulls") {
    val withNulls = Seq(Some(3.0), None, Some(1.0), None, Some(2.0)).toDF("v")
    assert(ranked(withNulls) == builtin(withNulls))
    val allNull = Seq[Option[Double]](None, None).toDF("v")
    assert(ranked(allNull) == qs.map(_ => None))
    val empty = Seq.empty[Double].toDF("v")
    assert(ranked(empty) == qs.map(_ => None))
  }

  test("matches the builtin on the real sf0.001 price column") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_extendedprice").as("v"))
    assert(ranked(li) == builtin(li))
  }
}
