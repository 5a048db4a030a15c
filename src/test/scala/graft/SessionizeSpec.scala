package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Event, Session}

/** Sessionization: batch gaps-and-islands vs streaming
  * flatMapGroupsWithState must agree on closed sessions.
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000)

  private val events = Seq(
    Event(1, ts(0), "view"), Event(1, ts(10), "click"), Event(1, ts(25), "view"),
    Event(1, ts(90), "view"),                    // gap > 30min → new session
    Event(2, ts(5), "signup"),
    Event(2, ts(50), "view"), Event(2, ts(70), "purchase"))

  private val expectedClosed = Set(
    // user 1: [0..25] 3 events (second session [90] still open at stream end)
    (1L, ts(0), ts(25), 3),
    // user 2: [5] 1 event, then [50..70] open
    (2L, ts(5), ts(5), 1))

  test("batch gaps-and-islands finds all sessions incl. open tails") {
    val got = Sessionize.sessionizeBatch(events.toDF())
      .as[(Long, Timestamp, Timestamp, Int)].collect().toSet
    assert(got == expectedClosed ++ Set((1L, ts(90), ts(90), 1), (2L, ts(50), ts(70), 2)))
  }

  test("batch sessionization honors sub-second gaps (no second-truncation)") {
    // gap = 30min + 800ms: a seconds-truncated compare would see
    // exactly 1800s and (wrongly) keep one session
    val e = Seq(
      Event(9, new Timestamp(1700000000100L), "view"),
      Event(9, new Timestamp(1700000000100L + Sessionize.GapMs + 800), "view"))
    assert(Sessionize.sessionizeBatch(e.toDF()).count() == 2)
    // and exactly at the gap boundary: still ONE session (gap is strict >)
    val f = Seq(
      Event(9, new Timestamp(1700000000100L), "view"),
      Event(9, new Timestamp(1700000000100L + Sessionize.GapMs), "view"))
    assert(Sessionize.sessionizeBatch(f.toDF()).count() == 1)
  }

  /** batch ≡ stream over arbitrary event sets at a given gap. Runs as
    * a scalacheck property so the generator hits the hard cases: ties
    * (0), sub-second gaps (1/800 ms), the exact boundary (gap is
    * strict >), and one past it. Parameterized by gap because the
    * derived watermark (`max(2h, 2·gap)`) must hold at every
    * registered config, not just the default.
    */
  private def batchStreamProperty(gapMs: Long, tag: String): Unit = {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genEv = for {
      u <- Gen.choose(1L, 3L)
      band <- Gen.choose(0L, 4L)
      off <- Gen.oneOf(
        Gen.oneOf(0L, 1L, 800L, gapMs, gapMs + 1),
        Gen.choose(0L, 2 * gapMs))
    } yield Event(u, new Timestamp(1700000000000L + band * gapMs + off), "e")
    var sample = 0
    val prop = Prop.forAll(Gen.listOfN(14, genEv)) { evs =>
      evs.isEmpty || {
        val batch = Sessionize.sessionizeBatch(evs.toDF(), gapMs = gapMs)
          .as[(Long, Timestamp, Timestamp, Int)].collect().toSet
        // one flush event per user, all at the SAME global time (2 gaps
        // past the latest event anywhere): each breaches its user's open
        // session so the stream EMITS the full session table, and the
        // flush sessions themselves stay open AND un-timed-out — with
        // per-user flush times, an early user's flush session could
        // breach the watermark driven by a LATE user's flush
        // (flush_u + gap < globalMax + 2·gap − delay when users' spans
        // differ by more than delay − gap) and be spuriously reported
        val globalFlushTs = evs.map(_.ts.getTime).max + 2 * gapMs
        val flush = evs.map(_.user_id).distinct.map(u =>
          Event(u, new Timestamp(globalFlushTs), "flush"))
        sample += 1
        val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event](spark)
        val q = Sessionize.sessionizeStream(spark, input.toDS(), gapMs = gapMs)
          .writeStream.outputMode("append").format("memory")
          .queryName(s"sessions_prop_${tag}_$sample").start()
        val stream = try {
          input.addData(evs ++ flush: _*)
          q.processAllAvailable()
          spark.table(s"sessions_prop_${tag}_$sample").as[Session].collect()
            .map(s => (s.user_id, s.session_start, s.session_end, s.n_events)).toSet
        } finally q.stop()
        batch == stream
      }
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(r.passed, r.status.toString)
  }

  test("batch and streaming sessionization agree on arbitrary event sets (property)") {
    batchStreamProperty(Sessionize.GapMs, "default")
  }

  test("batch/stream property holds at the registered 10-min gap (x_sessionize_g10)") {
    // gap (10 min) < the 2h watermark floor: the delay comes from the
    // floor, not 2·gap — the opposite arm of the derived-watermark max
    // from the wide-gap test below.
    batchStreamProperty(600000L, "g10")
  }

  test("a gap >= the old fixed watermark still matches batch (watermark derives from gap)") {
    // gapMs = 3h: under the former hard-coded 2h watermark the second
    // event (2.5h after the first) arrived below the watermark and the
    // stream split/dropped what batch merges. The derived delay
    // (2 x gap) keeps the session intact in both paths.
    val gap = 3 * 60 * 60 * 1000L
    val e = Seq(
      Event(4, new Timestamp(1700000000000L), "view"),
      Event(4, new Timestamp(1700000000000L + (2.5 * 60 * 60 * 1000).toLong), "view"),
      // flush sentinel: 2 gaps past the last event closes the session
      Event(4, new Timestamp(1700000000000L + (2.5 * 60 * 60 * 1000).toLong + 2 * gap), "flush"))
    val batch = Sessionize.sessionizeBatch(e.take(2).toDF(), gapMs = gap)
      .as[(Long, Timestamp, Timestamp, Int)].collect().toSet
    assert(batch.size == 1 && batch.head._4 == 2, "batch must merge the 2.5h-apart events at a 3h gap")
    val input = MemoryStream[Event](spark)
    val q = Sessionize.sessionizeStream(spark, input.toDS(), gapMs = gap)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_widegap").start()
    val stream = try {
      input.addData(e: _*)
      q.processAllAvailable()
      spark.table("sessions_widegap").as[Session].collect()
        .map(s => (s.user_id, s.session_start, s.session_end, s.n_events)).toSet
    } finally q.stop()
    assert(stream == batch, s"stream $stream must match batch $batch at gap >= 2h")
  }

  test("streaming flatMapGroupsWithState closes gap-breached sessions") {
    val input = MemoryStream[Event](spark)
    val q = Sessionize.sessionizeStream(spark, input.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_out").start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sessions_out").as[Session].collect()
      .map(s => (s.user_id, s.session_start, s.session_end, s.n_events)).toSet
    // only gap-breached (closed) sessions are emitted in append mode
    assert(got == expectedClosed)
  }
}
