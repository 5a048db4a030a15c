package graft.sources

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

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
  *     happen at the source.
  *
  * The "API" is a deterministic synthetic record generator standing in
  * for the HTTP endpoint (no egress in this environment); the
  * partition/pushdown machinery is the real thing.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.PagedRestSource")
  *     .option("entity", "quotation")
  *     .option("totalRows", 5000)
  *     .option("pageSize", 500)
  *     .load()
  * }}}
  */
class PagedRestSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedRestSource.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table =
    new PagedRestTable(
      properties.getOrDefault("entity", "quotation"),
      properties.getOrDefault("totalRows", "1000").toLong,
      properties.getOrDefault("pageSize", "500").toInt)
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

class PagedRestTable(entity: String, totalRows: Long, pageSize: Int)
    extends Table with SupportsRead {
  override def name(): String = s"paged_rest($entity)"
  override def schema(): StructType = PagedRestSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedRestScanBuilder(entity, totalRows, pageSize)
}

class PagedRestScanBuilder(entity: String, totalRows: Long, pageSize: Int)
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
      new PagedReaderFactory(entity, required, pushed)
  }
}

case class PagePartition(startId: Long, endId: Long) extends InputPartition

class PagedReaderFactory(entity: String, required: StructType, pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val PagePartition(start, end) = partition.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      private var id = start - 1
      private val keep: Long => Boolean = { i =>
        pushed.forall {
          case EqualTo("id", v) => i == v.asInstanceOf[Number].longValue
          case In("id", vs)     => vs.exists(v => v.asInstanceOf[Number].longValue == i)
          case GreaterThan("id", v) => i > v.asInstanceOf[Number].longValue
          case LessThan("id", v)    => i < v.asInstanceOf[Number].longValue
          case _ => true
        }
      }
      override def next(): Boolean = {
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
