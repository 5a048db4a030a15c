package graft

import org.apache.spark.sql.SparkSession

/** Local smoke runner mirroring the driver's t1 check: `entry` on
  * sf0.001 must return >0 rows. Optional arg = an explain target
  * query name to print its formatted physical plan.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n ${if (n > 0) "OK" else "FAIL"}")
    args.headOption.foreach { q =>
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
