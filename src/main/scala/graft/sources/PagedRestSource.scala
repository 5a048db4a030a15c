package graft.sources

import java.util.{Map => JMap}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import scala.jdk.CollectionConverters._

import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, In, LessThan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector modeling the reference's paginated REST
  * entity scan (SURVEY S1/S2: quote.py:75-99, opportunity.py:65-89):
  *
  *   - a count probe determines the total (here: the `totalRows`
  *     option — the analog of `top=1&count_total=true` reading
  *     `X-Total-Count`, opportunity.py:70-76);
  *   - the planner emits ceil(total/pageSize) input partitions, one
  *     per page — Spark's executors fetch pages concurrently exactly
  *     like the reference's 10-thread pool, but elastically;
  *   - column pruning (SupportsPushDownRequiredColumns ≙ the `brief`
  *     projection flag, quote.py:81) and filter pushdown
  *     (SupportsPushDownFilters; an `In(id, …)` filter ≙ the batched
  *     `$filter=id in (…)` semi-join prefetch of task.py:79-104)
  *     happen at the source;
  *   - every page fetch runs under retry-with-exponential-backoff
  *     (SURVEY S7 ≙ `safe_get`, quote.py:52-70: max_retries=5 attempts,
  *     wait 2^attempt between them, skip-or-fail when exhausted). The
  *     retry lives INSIDE the partition reader, so a transient failure
  *     costs one page re-fetch, never a Spark task retry (which would
  *     re-run the whole partition and, at scale, re-shuffle downstream).
  *
  * The "API" is a deterministic synthetic record generator standing in
  * for the HTTP endpoint (no egress in this environment); the
  * partition/pushdown/retry machinery is the real thing. Transient
  * faults are injectable for tests:
  *
  *   - `failAttemptsPerPage=k`: every page's first k fetch attempts
  *     throw (deterministic — exercises the backoff path on every
  *     partition);
  *   - `failEveryNthRequest=n`: every nth request served by the
  *     synthetic server throws (global flakiness, like a rate limiter;
  *     counters are per `faultDomain` so concurrent tests don't bleed).
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.PagedRestSource")
  *     .option("entity", "quotation")
  *     .option("totalRows", 5000)
  *     .option("pageSize", 500)
  *     .option("maxRetries", 5)          // attempts per page (safe_get max_retries)
  *     .option("retryBaseDelayMs", 100)  // wait = base·2^attempt, capped
  *     .load()
  * }}}
  */
class PagedRestSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedRestSource.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table = {
    def opt(k: String, dflt: String) = properties.getOrDefault(k, dflt)
    new PagedRestTable(
      opt("entity", "quotation"),
      opt("totalRows", "1000").toLong,
      opt("pageSize", "500").toInt,
      RetryConf(
        maxRetries = opt("maxRetries", "5").toInt,
        baseDelayMs = opt("retryBaseDelayMs", "100").toLong,
        maxDelayMs = opt("retryMaxDelayMs", "2000").toLong,
        skipOnExhausted = opt("skipOnExhaustedRetries", "false").toBoolean,
        failAttemptsPerPage = opt("failAttemptsPerPage", "0").toInt,
        failEveryNthRequest = opt("failEveryNthRequest", "0").toInt,
        faultDomain = opt("faultDomain", "default")))
  }
}

object PagedRestSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("org_id", LongType, nullable = false),
    StructField("total", DoubleType, nullable = false)))

  /** The synthetic "REST record" for a given id — deterministic, so
    * tests can assert exact results.
    */
  def record(entity: String, id: Long): (Long, String, Long, Double) =
    (id, s"$entity-$id", id % 100, (id % 997) * 1.5)
}

/** S7 retry policy (quote.py:52-70) + the synthetic fault injection. */
case class RetryConf(
    maxRetries: Int,
    baseDelayMs: Long,
    maxDelayMs: Long,
    skipOnExhausted: Boolean,
    failAttemptsPerPage: Int,
    failEveryNthRequest: Int,
    faultDomain: String)

/** Transient network failure from the synthetic server — the analog of
  * the `(ChunkedEncodingError, ConnectionError, Timeout)` family that
  * `safe_get` retries (quote.py:58).
  */
class TransientPageException(msg: String) extends RuntimeException(msg)

/** Global request counter per fault domain, driving the
  * `failEveryNthRequest` injection. Lives in the executor JVM like a
  * real flaky endpoint would — partition readers share it.
  */
object PageFaults {
  private val counters = new ConcurrentHashMap[String, AtomicLong]()
  def nextRequestNumber(domain: String): Long =
    counters.computeIfAbsent(domain, _ => new AtomicLong(0L)).incrementAndGet()
  def reset(domain: String): Unit = { counters.remove(domain); () }
}

class PagedRestTable(entity: String, totalRows: Long, pageSize: Int, retry: RetryConf)
    extends Table with SupportsRead {
  override def name(): String = s"paged_rest($entity)"
  override def schema(): StructType = PagedRestSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedRestScanBuilder(entity, totalRows, pageSize, retry)
}

class PagedRestScanBuilder(entity: String, totalRows: Long, pageSize: Int, retry: RetryConf)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = PagedRestSource.schema

  /** Accept id-filters the "API" can evaluate server-side (the `In`
    * case is the reference's batched IN-list prefetch); everything
    * else stays in Spark.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition {
      case EqualTo("id", _) | In("id", _) | GreaterThan("id", _) | LessThan("id", _) => true
      case _ => false
    }
    pushed = supported
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] = {
      // count-probe → page math (ceil-div, opportunity.py:76)
      val pages = ((totalRows + pageSize - 1) / pageSize).toInt
      (0 until pages).map(p => PagePartition(p.toLong * pageSize,
        math.min(totalRows, (p.toLong + 1) * pageSize)): InputPartition).toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new PagedReaderFactory(entity, required, pushed, retry)
  }
}

case class PagePartition(startId: Long, endId: Long) extends InputPartition

class PagedReaderFactory(
    entity: String, required: StructType, pushed: Array[Filter], retry: RetryConf)
    extends PartitionReaderFactory with Logging {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val PagePartition(start, end) = partition.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      private var id = start - 1
      private var fetched = false
      private var pageAvailable = true
      private val keep: Long => Boolean = { i =>
        pushed.forall {
          case EqualTo("id", v) => i == v.asInstanceOf[Number].longValue
          case In("id", vs)     => vs.exists(v => v.asInstanceOf[Number].longValue == i)
          case GreaterThan("id", v) => i > v.asInstanceOf[Number].longValue
          case LessThan("id", v)    => i < v.asInstanceOf[Number].longValue
          case _ => true
        }
      }

      /** One simulated page request. Throws [[TransientPageException]]
        * when a configured fault fires — the injectable stand-in for
        * the network errors `safe_get` retries.
        */
      private def serverRequest(attempt: Int): Unit = {
        if (attempt < retry.failAttemptsPerPage)
          throw new TransientPageException(
            s"injected failure: page [$start,$end) attempt ${attempt + 1}")
        if (retry.failEveryNthRequest > 0 &&
            PageFaults.nextRequestNumber(retry.faultDomain) % retry.failEveryNthRequest == 0)
          throw new TransientPageException(
            s"injected failure: every-${retry.failEveryNthRequest}th request, page [$start,$end)")
      }

      /** S7 `safe_get` (quote.py:52-70): up to maxRetries attempts,
        * sleep base·2^attempt (capped) between them; on exhaustion
        * either skip the page (`logging.error("… Skipping.")`, the
        * reference default) or fail the task (our default — silent data
        * loss must be opted into).
        */
      private def fetchPageWithRetry(): Boolean = {
        // at least one attempt always runs: maxRetries <= 0 must not
        // short-circuit into "page served without any request"
        val attempts = math.max(1, retry.maxRetries)
        var attempt = 0
        while (attempt < attempts) {
          try {
            serverRequest(attempt)
            return true
          } catch {
            case e: TransientPageException =>
              logWarning(s"Network error on attempt ${attempt + 1}/$attempts: ${e.getMessage}")
              attempt += 1
              if (attempt < attempts) {
                // cap the shift before shifting: an unbounded
                // `base << n` overflows Long past n≈57 and a negative
                // Thread.sleep throws instead of backing off
                val shift = math.min(attempt - 1, 20)
                Thread.sleep(math.min(retry.baseDelayMs << shift, retry.maxDelayMs))
              } else if (retry.skipOnExhausted) {
                logError(s"Max retries reached. Skipping page [$start,$end).")
                return false
              } else throw e
          }
        }
        true
      }

      override def next(): Boolean = {
        if (!fetched) { pageAvailable = fetchPageWithRetry(); fetched = true }
        if (!pageAvailable) return false
        id += 1
        while (id < end && !keep(id)) id += 1
        id < end
      }
      override def get(): InternalRow = {
        val (i, nm, org, tot) = PagedRestSource.record(entity, id)
        InternalRow.fromSeq(required.fieldNames.toSeq.map {
          case "id"     => i
          case "name"   => UTF8String.fromString(nm)
          case "org_id" => org
          case "total"  => tot
        })
      }
      override def close(): Unit = ()
    }
  }
}
