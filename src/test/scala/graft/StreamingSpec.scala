package graft

import graft.streaming.StreamingIngest

/** Streaming pipeline driven synchronously over the sf0.001 events:
  * the windowed-agg result must equal the equivalent batch query.
  */
class StreamingSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("streaming windowed counts equal the batch equivalent") {
    val dir = "/root/testdata/sf0.001"
    val q = StreamingIngest.startMemorySink(spark, dir, "stream_out")
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("stream_out")

    val batch = StreamingIngest.windowedCounts(
      // batch frame through the same transform: read statically
      Tables.events(spark, dir))

    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
