package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.Relational._

/** Property-based tests (SURVEY §5.3) via raw ScalaCheck: dedup
  * idempotence, EAV pivot/unpivot round-trip, coalesce-chain ordering.
  * Spark actions inside properties are expensive, so each property
  * batches its sample inputs into ONE DataFrame and checks all rows in
  * a single job.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 30): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.passed, r.status.toString)
  }

  test("D1 dedup is idempotent and output-distinct for arbitrary row multisets") {
    val genRows = Gen.listOfN(40, Gen.zip(Gen.choose(0, 5), Gen.oneOf("a", "b", "c")))
    check(Prop.forAll(genRows) { rows =>
      val df = rows.toDF("x", "y")
      val once = dedup(df).collect().toSet
      val twice = dedup(dedup(df)).collect().toSet
      val expected = rows.distinct.size
      once.size == expected && twice == once
    }, n = 10)
  }

  test("G3 EAV pivot round-trip: every written key reads back, absent keys read \"\"") {
    val genKv = Gen.listOfN(5, Gen.zip(Gen.identifier.map(_.take(8)), Gen.alphaNumStr.map(_.take(6))))
      .map(kvs => kvs.toMap.toList) // distinct keys (map_from_entries is strict under ANSI)
    check(Prop.forAll(genKv) { kvs =>
      kvs.isEmpty || {
        val eav = array(kvs.map { case (k, v) =>
          struct(lit(k).as("FIELD_NAME"), lit(v).as("FIELD_VALUE"))
        }: _*)
        val cols = kvs.map { case (k, _) => eavGet(col("cf"), k) } :+
          eavGet(col("cf"), "__definitely_absent__")
        val row = Seq(1).toDF("i").withColumn("cf", pivotEav(eav))
          .select(cols: _*).head()
        kvs.zipWithIndex.forall { case ((_, v), i) => row.getString(i) == v } &&
          row.getString(kvs.size) == ""
      }
    }, n = 15)
  }

  test("P2 coalesce-chain ordering: first non-null wins, empty-string default last") {
    val genOpts = Gen.zip(Gen.option(Gen.alphaStr.map(_.take(4))),
      Gen.option(Gen.alphaStr.map(_.take(4))))
    check(Prop.forAll(genOpts) { case (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val got = df.select(coalesce(col("a"), col("b"), lit("")).as("r")).head.getString(0)
      got == a.orElse(b).getOrElse("")
    }, n = 15)
  }
}
