package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1's REAL form as a DataSource V2: the reference iterates a paginated
  * REST collection page by page on one machine
  * (`dags/tasks/planning_center.py:17` via `pypco.iterate`, 100-row pages);
  * here every PAGE IS AN INPUT PARTITION, so a 1000-executor cluster pulls
  * 1000 pages concurrently and "pagination" disappears into Spark's
  * partitioning (SURVEY.md §2.1 S1).
  *
  *  - `spark.read.format("paginated").option("pages", n)
  *    .option("pageSize", m).load()` — schema (list_id, list_name,
  *    n_members).
  *  - Column pruning is pushed into the reader
  *    ([[SupportsPushDownRequiredColumns]]): a projection of one column
  *    fetches/decodes only that column (asserted on ReadSchema in
  *    PaginatedSourceSpec).
  *  - [[PaginatedSource.fetchPage]] is the client seam where a real
  *    implementation performs the HTTP GET (auth, retry, rate-limit —
  *    executor-side, one page per task). This offline build ships a
  *    deterministic fake: row k of the collection is
  *    (k, 'list_<k>', (7k+3) mod 100) — pure arithmetic, so correctness
  *    is oracle-checkable without any network.
  *
  * The Selenium/TOTP login flow of the reference's webscraper
  * (`webscraper.py:28-47`) stays out of scope by design — that is
  * credential plumbing, not query semantics.
  */
class PaginatedSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "paginated"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PaginatedSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // The properties map preserves the caller's option casing; read
    // options are case-insensitive by contract, so normalize here.
    val opts = new CaseInsensitiveStringMap(properties)
    new PaginatedTable(
      opts.getInt("pages", 10),
      opts.getInt("pageSize", 100))
  }
}

object PaginatedSource {
  val Schema: StructType = StructType(Seq(
    StructField("list_id", LongType, nullable = false),
    StructField("list_name", StringType, nullable = false),
    StructField("n_members", LongType, nullable = false)))

  /** The page "fetch": deterministic fake rows for collection indices
    * [page*pageSize, min((page+1)*pageSize, total)). A real client issues
    * `GET /people/v2/lists?offset=...&per_page=...` here instead.
    */
  def fetchPage(page: Int, pageSize: Int, totalRows: Long): Seq[(Long, String, Long)] = {
    fetches.incrementAndGet()
    val start = page.toLong * pageSize
    val end = math.min(start + pageSize, totalRows)
    (start until end).map(k => (k, s"list_$k", (7 * k + 3) % 100))
  }

  /** Test observability: page fetches in this JVM (local-mode executors
    * share it). The COUNT(*) pushdown contract is "zero fetches".
    */
  val fetches = new java.util.concurrent.atomic.AtomicLong(0)
}

private[sources] class PaginatedTable(pages: Int, pageSize: Int)
    extends Table with SupportsRead {
  override def name(): String = s"paginated($pages x $pageSize)"
  override def schema(): StructType = PaginatedSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PaginatedScanBuilder(pages, pageSize)
}

private[sources] class PaginatedScanBuilder(pages: Int, pageSize: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates {
  private var required: StructType = PaginatedSource.Schema
  private var pushed: Array[Filter] = Array.empty
  private var countPushed = false
  // Row-index bounds implied by pushed list_id comparisons (inclusive).
  private var loRow: Long = 0L
  private var hiRow: Long = pages.toLong * pageSize - 1

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Filter pushdown → PAGE pruning: `list_id` is the collection's row
    * index, so a comparison against it bounds the covered index range and
    * with it the set of pages worth fetching — the DSv2 analog of
    * parquet's row-group-stats pruning, applied to HTTP round-trips: a
    * `list_id < 50` probe against a million-page collection plans (and
    * fetches) two pages, not a million. Pruning is page-granular, so
    * every filter is also returned as residual for Spark to re-apply
    * row-by-row; `pushedFilters` reports the comparisons the source
    * actually consumed (visible as PushedFilters in explain).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def longVal(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int  => Some(i.toLong)
      case s: Short => Some(s.toLong)
      case _ => None
    }
    pushed = filters.flatMap {
      case f @ EqualTo("list_id", v) => longVal(v).map { x =>
        loRow = math.max(loRow, x); hiRow = math.min(hiRow, x); f }
      case f @ GreaterThan("list_id", v) => longVal(v).map { x =>
        loRow = math.max(loRow, x + 1); f }
      case f @ GreaterThanOrEqual("list_id", v) => longVal(v).map { x =>
        loRow = math.max(loRow, x); f }
      case f @ LessThan("list_id", v) => longVal(v).map { x =>
        hiRow = math.min(hiRow, x - 1); f }
      case f @ LessThanOrEqual("list_id", v) => longVal(v).map { x =>
        hiRow = math.min(hiRow, x); f }
      case _ => None
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** COUNT(*) pushdown — the REST analog: a paginated collection's
    * `total_count` metadata field answers an ungrouped count with ZERO
    * page fetches (one metadata round-trip instead of pages × rows of
    * transfer — the difference between instant and hours against a
    * million-page collection). Pushdown is refused whenever any filter
    * was pushed: page-range pruning is page-GRANULAR with row-level
    * residuals re-applied by Spark, so the source cannot answer a
    * filtered count exactly — correctness over cleverness.
    */
  private def countStarOnly(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && pushed.isEmpty &&
      agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions.head.isInstanceOf[CountStar]

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    countStarOnly(agg)

  override def pushAggregation(agg: Aggregation): Boolean = {
    countPushed = countStarOnly(agg)
    countPushed
  }

  override def build(): Scan =
    if (countPushed) new CountOnlyScan(pages.toLong * pageSize)
    else new PaginatedScan(pages, pageSize, required, loRow, hiRow)
}

/** The one-row answer to a pushed COUNT(*): a single partition carrying
  * the collection's total_count — no page is ever fetched.
  */
private[sources] class CountOnlyScan(total: Long) extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(Seq(StructField("COUNT(*)", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(PagePartition(0, 0, total))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val total = partition.asInstanceOf[PagePartition].totalRows
        new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean = !emitted && { emitted = true; true }
          override def get(): InternalRow = InternalRow(total)
          override def close(): Unit = ()
        }
      }
    }
  override def description(): String = s"PushedAggregates: [COUNT(*)] total=$total"
}

private[sources] class PaginatedScan(pages: Int, pageSize: Int,
    required: StructType, loRow: Long, hiRow: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  /** Only pages intersecting the pushed [loRow, hiRow] index range are
    * planned; an unsatisfiable range plans zero partitions (no fetch at
    * all). Untouched by pruning this is every page, as before.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    if (hiRow < loRow) return Array.empty
    val pLo = math.max(0L, loRow / pageSize).toInt
    val pHi = math.min(pages - 1L, hiRow / pageSize).toInt
    (pLo to pHi).map(p => PagePartition(p, pageSize, pages.toLong * pageSize))
      .toArray[InputPartition]
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PageReaderFactory(required.fieldNames)
}

private[sources] case class PagePartition(page: Int, pageSize: Int, totalRows: Long)
    extends InputPartition

private[sources] class PageReaderFactory(columns: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      private val rows = PaginatedSource.fetchPage(p.page, p.pageSize, p.totalRows).iterator
      private var current: (Long, String, Long) = _
      override def next(): Boolean = { val has = rows.hasNext; if (has) current = rows.next(); has }
      override def get(): InternalRow =
        InternalRow.fromSeq(columns.toSeq.map {
          case "list_id"   => current._1
          case "list_name" => UTF8String.fromString(current._2)
          case "n_members" => current._3
        })
      override def close(): Unit = ()
    }
  }
}
