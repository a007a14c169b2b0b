package graft.sources.v2

import java.time.LocalDate
import java.time.temporal.ChronoUnit
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.RestSource

/** DataSourceV2 wrapper for the paginated/bisecting REST scan (SURVEY
  * §7.3's optional "DataSourceV2 for the REST source"): the fetch runs
  * INSIDE the Spark plan — one `InputPartition` per date window, each
  * executor task paginating its own window with the S1 client and falling
  * back to S2 date-bisection on offset-ceiling errors, all within the
  * task. At 1000 executors the ingest parallelizes by window with no
  * driver bottleneck; the driver only plans the calendar split.
  *
  * Output schema is a single `json STRING` column (one API result per
  * row) — downstream structure belongs to the declarative FlattenSpecs,
  * so no schema inference happens on the wire.
  *
  * Options: `endpoint`, `baseUrl`, `transportFactory` (FQCN of a
  * [[TransportFactory]], instantiated per task — tests inject stubs the
  * same way the reference tests stub their HTTP session), optional
  * `dateStart`/`dateEnd` (inclusive ISO dates) + `windowDays` partition
  * granularity, and `param.*` passthrough query parameters.
  */
trait TransportFactory extends Serializable {
  def create(): RestSource.HttpTransport
}

class RestDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestDataSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new RestTable(properties.asScala.toMap)
}

object RestDataSource {
  val schema: StructType = StructType(Seq(StructField("json", StringType, nullable = false)))
}

private[v2] final class RestTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"rest(${props.getOrElse("endpoint", "?")})"
  override def schema(): StructType = RestDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new RestScan(props ++ options.asScala)
    }
}

private[v2] final case class RestWindowPartition(
    dateStart: Option[String], dateEnd: Option[String]) extends InputPartition

private[v2] final class RestScan(opts: Map[String, String]) extends Scan with Batch {
  override def readSchema(): StructType = RestDataSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"RestScan(endpoint=${opts.getOrElse("endpoint", "?")})"

  /** Static partition planning: split the inclusive [dateStart, dateEnd]
    * calendar into windowDays-sized windows, one task each. Without a
    * date range the scan is a single partition (offset paging only).
    */
  override def planInputPartitions(): Array[InputPartition] = {
    (opts.get("datestart"), opts.get("dateend")) match {
      case (Some(s0), Some(e0)) =>
        val start = LocalDate.parse(s0)
        val end = LocalDate.parse(e0)
        require(!end.isBefore(start), s"dateEnd $end before dateStart $start")
        val windowDays = opts.get("windowdays").map(_.toInt).filter(_ > 0).getOrElse(35)
        val n = ChronoUnit.DAYS.between(start, end) + 1
        val out = Array.newBuilder[InputPartition]
        var ws = start
        while (!ws.isAfter(end)) {
          val we = Seq(ws.plusDays(windowDays - 1), end).min(Ordering.by((d: LocalDate) => d.toEpochDay))
          out += RestWindowPartition(Some(ws.toString), Some(we.toString))
          ws = we.plusDays(1)
        }
        val planned = out.result()
        assert(planned.nonEmpty && n > 0)
        planned
      case _ => Array(RestWindowPartition(None, None))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory(
      endpoint = opts.getOrElse("endpoint", sys.error("endpoint option required")),
      baseUrl = opts.getOrElse("baseurl", sys.error("baseUrl option required")),
      factoryClass = opts.getOrElse("transportfactory", sys.error("transportFactory option required")),
      params = opts.collect { case (k, v) if k.startsWith("param.") => k.stripPrefix("param.") -> v })
}

private[v2] final class RestReaderFactory(
    endpoint: String, baseUrl: String, factoryClass: String,
    params: Map[String, String]) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val win = partition.asInstanceOf[RestWindowPartition]
    new PartitionReader[InternalRow] {
      // the transport instantiates ON THE EXECUTOR, once per task — the
      // connection-per-partition pattern (no driver-side client ships over)
      private lazy val rows: Iterator[String] = {
        val transport = Class.forName(factoryClass)
          .getDeclaredConstructor().newInstance()
          .asInstanceOf[TransportFactory].create()
        val client = new RestSource.Client(transport, baseUrl)
        val winParams = params ++
          win.dateStart.map("date_start" -> _) ++ win.dateEnd.map("date_end" -> _)
        // S2 bisection runs inside the task when this window still hits
        // the API's offset ceiling
        val summary = RestSource.getDatePartitioned(client, endpoint, winParams)
        if (!summary.ok)
          throw new java.io.IOException(
            s"REST scan failed for window ${win.dateStart}..${win.dateEnd}: ${summary.error.getOrElse("?")}")
        summary.results.iterator.map(_.toString)
      }
      private var current: UTF8String = _
      override def next(): Boolean =
        if (rows.hasNext) { current = UTF8String.fromString(rows.next()); true } else false
      override def get(): InternalRow = InternalRow(current)
      override def close(): Unit = ()
    }
  }
}
