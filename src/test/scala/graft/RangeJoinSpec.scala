package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin.rangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def mk(name: String, idCol: String, tsCol: String, rows: (Long, Long, Long)*) =
    rows.toDF(idCol, "user_id", "sec")
      .select(col(idCol), col("user_id"), timestamp_seconds(col("sec")).as(tsCol))

  private def run(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame,
      tol: Long) =
    rangeJoin(l, r, "user_id", "ts_a", "ts_b", tol)
      .select("id_a", "id_b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet

  test("pairs within tolerance match exactly once, including across band edges") {
    // tol=100s: bands are [0,100), [100,200)... ids 1@95 and 2@105 are
    // in adjacent bands but 10s apart — must match, exactly once.
    val l = mk("l", "id_a", "ts_a", (1L, 7L, 95L), (3L, 7L, 400L))
    val r = mk("r", "id_b", "ts_b", (2L, 7L, 105L), (4L, 7L, 501L))
    assert(run(l, r, 100L) == Set((1L, 2L)))
  }

  test("boundary is inclusive; beyond-tolerance and cross-key pairs are excluded") {
    val l = mk("l", "id_a", "ts_a", (1L, 7L, 0L), (2L, 7L, 0L), (3L, 8L, 0L))
    val r = mk("r", "id_b", "ts_b", (10L, 7L, 100L), (11L, 7L, 101L), (12L, 9L, 0L))
    // id 1,2 @0: 10@100 is exactly tol -> included; 11@101 -> excluded;
    // 12 is another user's -> excluded.
    assert(run(l, r, 100L) == Set((1L, 10L), (2L, 10L)))
  }

  test("rejects inputs whose columns collide with the banding names") {
    val l = mk("l", "id_a", "ts_a", (1L, 7L, 95L))
    val r = mk("r", "id_b", "ts_b", (2L, 7L, 105L))
    val e1 = intercept[IllegalArgumentException] {
      rangeJoin(l.withColumn("__band", lit(0)), r, "user_id", "ts_a", "ts_b", 100L)
    }
    assert(e1.getMessage.contains("__band"))
    val e2 = intercept[IllegalArgumentException] {
      rangeJoin(l, r.withColumn("__lband", lit(0)), "user_id", "ts_a", "ts_b", 100L)
    }
    assert(e2.getMessage.contains("__lband"))
  }

  test("equals the naive inequality join on the events table") {
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sf)
    val a = ev.select(col("event_id").as("id_a"), col("user_id"), col("ts").as("ts_a"))
    val b = ev.select(col("event_id").as("id_b"), col("user_id"), col("ts").as("ts_b"))
    val banded = rangeJoin(a, b, "user_id", "ts_a", "ts_b", 1800L)
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // naive reference: respell the key on each side so the self-join
    // condition is unambiguous
    val a2 = ev.select(col("event_id").as("id_a"), col("user_id").as("u_a"), col("ts").as("ts_a"))
    val b2 = ev.select(col("event_id").as("id_b"), col("user_id").as("u_b"), col("ts").as("ts_b"))
    val ref = a2.join(b2, col("u_a") === col("u_b") && col("id_a") < col("id_b") &&
        abs(unix_micros(col("ts_b")) - unix_micros(col("ts_a"))) <= 1800000000L)
      .select("id_a", "id_b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(banded == ref)
    assert(banded.nonEmpty)
  }
}
