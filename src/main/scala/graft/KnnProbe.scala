package graft

import org.apache.spark.sql.SparkSession

/** Measurement harness for the kNN edge-build's plane-count scaling
  * law (TESTDATA.md round-13 wave): times one cold
  * `SimilarityQueries.knnEdgesDf` build at an explicit (bands, r, k)
  * and prints one JSON line with seconds + edge rows.
  *
  * Why it exists: the sf0.1→sf1 sweep measured the registry configs'
  * edge builds growing SUPERLINEARLY (exponent ~1.2) — at fixed r the
  * bucket count is fixed (2^r per band), so 10× vectors means 10× the
  * occupancy of every bucket and ~100× the within-bucket candidate
  * pairs. The mitigation at scale is that r grows with log2(N)
  * (buckets ∝ N holds expected occupancy — and per-node candidate
  * quality — constant); this probe is how that claim gets MEASURED
  * instead of argued: run it at a scale point with the registry's r
  * and with r + log2(scale-up), compare.
  *
  * Usage: runMain graft.KnnProbe <sfDir> <bands> <r> <k>
  */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println("usage: runMain graft.KnnProbe <sfDir> <bands> <r> <k>")
      sys.exit(2)
    }
    val Array(sfDir, bands, r, k) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config(Tables.NanosAsLongKey, "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // codegen warm-up
    val t0 = System.nanoTime()
    val rows = llm.SimilarityQueries.knnEdgesDf(spark, sfDir, bands.toInt, r.toInt, k.toInt).count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(s"""{"probe":"knn_edges","sf":"$sfDir","bands":$bands,"r":$r,"k":$k,"secs":$secs,"rows":$rows}""")
    spark.stop()
  }
}
