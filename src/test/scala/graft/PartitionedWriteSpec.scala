package graft

import org.apache.spark.sql.functions._

/** Data-layout technique for 100 TB reads: partitionBy on write means
  * a filter on the partition column prunes whole directories at plan
  * time — the scan never touches other partitions' files.
  */
class PartitionedWriteSpec extends SparkSpec {

  test("partitionBy write + partition-pruned read") {
    val dir = java.nio.file.Files.createTempDirectory("graftpart").toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)

    val en = spark.read.parquet(dir).where(col("lang") === "en")
    val plan = en.queryExecution.executedPlan.toString

    // pruning is visible as a PartitionFilters entry naming the column …
    assert(plan.contains("PartitionFilters") && plan.contains("(lang"),
      s"no partition filters in:\n$plan")
    // … and the pruned scan selects exactly one of the five lang dirs
    val scan = en.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 selected partition, got ${scan.selectedPartitions.partitionCount}")
    assert(en.count() ==
      Tables.documents(spark, "/root/testdata/sf0.001").where(col("lang") === "en").count())
  }
}
