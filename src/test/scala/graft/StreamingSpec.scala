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

  test("foreachBatch sink writes then publishes (K2/K3 commit protocol)") {
    val out = java.nio.file.Files.createTempDirectory("graftsink").toString
    val q = StreamingIngest.startForeachBatchSink(spark, "/root/testdata/sf0.001", out)
    try q.processAllAvailable() finally q.stop()
    val published = new java.io.File(out).listFiles.map(_.getName).filter(_.startsWith("_published_"))
    assert(published.nonEmpty)
    val target = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/${published.head}"))
    assert(spark.read.parquet(target).count() > 0)
  }
}
