package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin.asofJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // (id, key, ts) probes / (key, ts, id, value) references
  private def left(rows: (Long, Long, Long)*) =
    rows.toDF("event_id", "user_id", "ts")
  private def right(rows: (Long, Long, Long, Double)*) =
    rows.toDF("user_id", "ts", "event_id", "value")

  private def run(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
    asofJoin(l, r, key = "user_id", ts = "ts", rightCols = Seq("event_id", "value"))
      .select("event_id", "user_id", "ts", "prior_event_id", "prior_ts", "prior_value")
      .collect().map(x => (x.getLong(0),
        Option(x.get(3)).map(_.asInstanceOf[Long]),
        Option(x.get(4)).map(_.asInstanceOf[Long]),
        Option(x.get(5)).map(_.asInstanceOf[Double])))
      .toSet

  test("picks the greatest right ts <= left ts, per key") {
    val got = run(
      left((1L, 7L, 100L), (2L, 7L, 200L)),
      right((7L, 50L, 10L, 1.0), (7L, 150L, 11L, 2.0), (7L, 999L, 12L, 3.0)))
    assert(got == Set(
      (1L, Some(10L), Some(50L), Some(1.0)),
      (2L, Some(11L), Some(150L), Some(2.0))))
  }

  test("left-outer: no prior right row -> null payload") {
    val got = run(
      left((1L, 7L, 100L)),
      right((7L, 150L, 11L, 2.0)))
    assert(got == Set((1L, None, None, None)))
  }

  test("simultaneous right row matches (<= semantics)") {
    val got = run(
      left((1L, 7L, 100L)),
      right((7L, 100L, 11L, 2.0)))
    assert(got == Set((1L, Some(11L), Some(100L), Some(2.0))))
  }

  test("keys never cross: other users' rights are invisible") {
    val got = run(
      left((1L, 7L, 100L)),
      right((8L, 50L, 11L, 2.0)))
    assert(got == Set((1L, None, None, None)))
  }

  test("a NULL field in the matched right row stays NULL (no torn rows from older rows)") {
    val l = left((1L, 7L, 200L))
    val r = Seq((7L, 50L, 10L, Some(1.0)), (7L, 150L, 11L, None))
      .toDF("user_id", "ts", "event_id", "value")
    val got = run(l, r)
    // the matched row IS (ts=150, id=11, value=NULL); value must not
    // be backfilled from the older (ts=50, value=1.0) row
    assert(got == Set((1L, Some(11L), Some(150L), None)))
  }

  test("right rows with NULL ts never match") {
    val l = left((1L, 7L, 200L))
    val r = Seq((7L, Option.empty[Long], 11L, Some(2.0)))
      .toDF("user_id", "ts", "event_id", "value")
    val got = run(l, r)
    assert(got == Set((1L, None, None, None)))
  }

  test("rejects inputs whose columns collide with internal/emitted names") {
    val l = left((1L, 7L, 100L))
    val r = right((7L, 50L, 10L, 1.0))
    // left 'side' would be silently overwritten by the tag constant
    val e1 = intercept[IllegalArgumentException] {
      asofJoin(l.withColumn("side", lit("x")), r, "user_id", "ts", Seq("value"))
    }
    assert(e1.getMessage.contains("side"))
    // left column equal to an emitted prior_* name would be clobbered
    val e2 = intercept[IllegalArgumentException] {
      asofJoin(l.withColumn("prior_value", lit(0)), r, "user_id", "ts", Seq("value"))
    }
    assert(e2.getMessage.contains("prior_value"))
    // right '__prior' collides with the working struct
    val e3 = intercept[IllegalArgumentException] {
      asofJoin(l, r.withColumn("__prior", lit(1)), "user_id", "ts", Seq("value"))
    }
    assert(e3.getMessage.contains("__prior"))
    // rightCols repeating ts would duplicate the prior_ts struct field
    val e4 = intercept[IllegalArgumentException] {
      asofJoin(l, r, "user_id", "ts", Seq("ts", "value"))
    }
    assert(e4.getMessage.contains("ts"))
  }

  test("matches a per-row subquery reference on the events table") {
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sf)
    val clicks = ev.where(col("event_type") === "click").select("event_id", "user_id", "ts")
    val purchases = ev.where(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    val got = asofJoin(clicks, purchases, "user_id", "ts", Seq("event_id", "value"))
    // reference: correlated max-ts lookup via plain join + argmax
    val j = clicks.as("a").join(purchases.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.ts") >= col("b.ts"), "left")
      .groupBy(col("a.event_id").as("event_id"))
      .agg(max(struct(col("b.ts"), col("b.event_id"))).as("m"))
      .select(col("event_id"), col("m.ts").as("ref_prior_ts"), col("m.event_id").as("ref_prior_id"))
    val diff = got.join(j, "event_id")
      .where(!(col("prior_ts") <=> col("ref_prior_ts")) ||
             !(col("prior_event_id") <=> col("ref_prior_id")))
    assert(diff.isEmpty)
  }
}
