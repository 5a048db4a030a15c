package graft

import org.apache.spark.sql.graft.{AsOfJoinExec, AsOfJoinNative}
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The custom-SparkPlan as-of join must (1) actually plan as
  * AsOfJoinExec with the exchanges/sorts EnsureRequirements owes it,
  * and (2) agree with the declarative union-scan formulation — the
  * oracle-checked reference — on hand-picked edges and random inputs.
  */
class AsOfJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  private def left(rows: (Long, Long, Long)*) =
    rows.toDF("event_id", "user_id", "ts")
  private def right(rows: (Long, Long, Long, Double)*) =
    rows.toDF("user_id", "ts", "event_id", "value")

  private def collectSet(df: org.apache.spark.sql.DataFrame) = df
    .select("event_id", "user_id", "ts", "prior_event_id", "prior_ts", "prior_value")
    .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
      Option(x.get(3)).map(_.asInstanceOf[Long]),
      Option(x.get(4)).map(_.asInstanceOf[Long]),
      Option(x.get(5)).map(_.asInstanceOf[Double])))
    .toSet

  private def native(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
    AsOfJoinNative.asofJoinNative(l, r, key = "user_id", ts = "ts",
      rightCols = Seq("event_id", "value"))

  private def declarative(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
    graft.operators.AsOfJoin.asofJoin(l, r, key = "user_id", ts = "ts",
      rightCols = Seq("event_id", "value"))

  test("plans as AsOfJoinExec and matches the declarative formulation on edges") {
    val l = left((1L, 7L, 100L), (2L, 7L, 200L), (3L, 8L, 10L), (4L, 9L, 100L))
    val r = right((7L, 50L, 10L, 1.0), (7L, 150L, 11L, 2.0), (7L, 999L, 12L, 3.0),
      (7L, 100L, 13L, 4.0), // simultaneous with left 1 -> <= matches
      (9L, 100L, 14L, 5.0))
    val df = native(l, r)
    // AdaptiveSparkPlan hides its inner plan from collect(); the string
    // form shows it. Assert the custom exec AND its required shape —
    // EnsureRequirements must have planted the key exchange and the
    // (key, ts) sort on both children.
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("AsOfJoin "), s"no AsOfJoinExec in:\n$planStr")
    assert(planStr.contains("Exchange hashpartitioning(user_id"), planStr)
    assert("""Sort \[user_id#\d+L ASC NULLS FIRST, ts#\d+L ASC NULLS FIRST\]""".r
      .findAllIn(planStr).size >= 2, planStr)
    assert(collectSet(df) == collectSet(declarative(l, r)))
    // and concretely: ties at equal ts take the simultaneous row
    assert(collectSet(df).contains((1L, 7L, 100L, Some(13L), Some(100L), Some(4.0))))
    // user 8 has no rights at all -> null payload, row preserved
    assert(collectSet(df).contains((3L, 8L, 10L, None, None, None)))
  }

  test("downstream groupBy(key) reuses the join's partitioning under AQE — no third exchange") {
    // AsOfJoinExec advertises outputPartitioning = left child's, so a
    // key-clustered consumer must be satisfied by the exchange the
    // children ALREADY paid — a third Exchange between the exec and
    // the aggregate would mean the advertisement regressed (the exact
    // reason the r9 outputPartitioning fix exists).
    val l = left((1L, 7L, 100L), (2L, 7L, 200L), (3L, 8L, 10L), (4L, 9L, 100L),
      (5L, 8L, 500L), (6L, 9L, 700L))
    val r = right((7L, 50L, 10L, 1.0), (8L, 9L, 11L, 2.0), (9L, 650L, 12L, 3.0))
    val agg = native(l, r).groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.max("prior_value").as("mx"))
    agg.collect() // materialize so AQE finalizes its stage plan
    // the AQE string renders Final AND Initial plans — count only the
    // finalized one, or every exchange double-counts
    val planStr = agg.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(planStr.contains("AsOfJoin "), s"no AsOfJoinExec in:\n$planStr")
    val nEx = "Exchange hashpartitioning".r.findAllIn(planStr).size
    assert(nEx == 2,
      s"expected exactly the two child exchanges between scan and aggregate, got $nEx:\n$planStr")
  }

  test("native equals declarative on random keyed event sets (property)") {
    val genL = Gen.listOfN(20, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 30L)))
    val genR = Gen.listOfN(12, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 30L)))
    val prop = Prop.forAll(Gen.zip(genL, genR)) { case (ls, rs) =>
      val l = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("event_id", "user_id", "ts")
      // right unique per (key, ts): max synthetic id wins, matching the
      // operator contract both formulations share
      val r = rs.distinctBy(identity).zipWithIndex
        .map { case ((k, t), i) => (k, t, 100L + i, i.toDouble) }
        .toDF("user_id", "ts", "event_id", "value")
      collectSet(native(l, r)) == collectSet(declarative(l, r))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("null keys match each other, exactly like the declarative window formulation") {
    val l = Seq[(java.lang.Long, java.lang.Long, java.lang.Long)](
      (1L, null, 100L), (2L, 7L, 100L))
      .toDF("event_id", "user_id", "ts")
    val r = Seq[(java.lang.Long, java.lang.Long, java.lang.Long, java.lang.Double)](
      (null, 50L, 10L, 1.0), (7L, 60L, 11L, 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    val n = native(l, r).select("event_id", "prior_event_id").collect()
      .map(x => x.getLong(0) -> Option(x.get(1)).map(_.asInstanceOf[Long])).toMap
    val d = declarative(l, r).select("event_id", "prior_event_id").collect()
      .map(x => x.getLong(0) -> Option(x.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(n == d && n == Map(1L -> Some(10L), 2L -> Some(11L)))
  }

  test("string keys survive buffer reuse (remembered key is deep-copied)") {
    // many rows per partition forces row-buffer reuse in the sorted
    // streams; with an aliased remembered key the LAST match would
    // bleed into foreign keys
    val l = (1 to 200).map(i => (i.toLong, s"u${i % 5}", 100L + i))
      .toDF("event_id", "user_id", "ts")
    val r = (1 to 50).map(i => (s"u${i % 5}", 40L + i, 1000L + i, i.toDouble))
      .toDF("user_id", "ts", "event_id", "value")
    val got = collectSetStr(native(l, r))
    val want = collectSetStr(declarative(l, r))
    assert(got == want)
  }

  private def collectSetStr(df: org.apache.spark.sql.DataFrame) = df
    .select("event_id", "user_id", "ts", "prior_event_id", "prior_ts", "prior_value")
    .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2),
      Option(x.get(3)).map(_.asInstanceOf[Long]),
      Option(x.get(4)).map(_.asInstanceOf[Long]),
      Option(x.get(5)).map(_.asInstanceOf[Double])))
    .toSet

  test("self-join: both sides from one frame do not collide on expression ids") {
    val ev = Seq((1L, 7L, 100L, "click", 1.0), (2L, 7L, 50L, "purchase", 2.0),
      (3L, 7L, 200L, "purchase", 3.0)).toDF("event_id", "user_id", "ts", "event_type", "value")
    val clicks = ev.where($"event_type" === "click").select("event_id", "user_id", "ts")
    val purchases = ev.where($"event_type" === "purchase")
      .select("user_id", "ts", "event_id", "value")
    val got = collectSet(native(clicks, purchases))
    assert(got == Set((1L, 7L, 100L, Some(2L), Some(50L), Some(2.0))))
  }
}
