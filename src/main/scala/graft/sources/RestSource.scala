package graft.sources

import java.time.LocalDate

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ArrayNode

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Paginated REST scan + adaptive date-bisection (SURVEY §2.1 S1/S2;
  * reference extract/oireachtas/client.py:76-366 and
  * partitioned_fetch.py:11-87). The connector is driver-side (it feeds
  * `spark.read.json` / createDataset); transport is a trait so the
  * zero-egress tests inject deterministic stubs, exactly as the reference
  * tests stub their session.
  */
object RestSource {

  /** Minimal HTTP transport abstraction. */
  trait HttpTransport {
    def get(url: String, params: Map[String, String]): HttpResult
  }
  final case class HttpResult(statusCode: Int, body: String, elapsedSeconds: Double = 0.0)

  final case class Pagination(
      complete: Boolean,
      pageCount: Int,
      pageSize: Int,
      initialSkip: Int,
      fetchedCount: Int,
      reportedTotal: Option[Long],
      stopReason: String,
      intentionallyLimited: Boolean,
      partitioned: Boolean = false,
      partitionCount: Int = 0)

  final case class ApiSummary(
      endpoint: String,
      ok: Boolean,
      statusCode: Option[Int],
      error: Option[String],
      results: Vector[JsonNode],
      pagination: Pagination)

  val DefaultPageSize = 200
  val DefaultMaxPages = 1000

  private val mapper = new ObjectMapper()

  /** Retrying single-page GET (client.py:263-313): retry on 429/5xx and
    * transport exceptions with linear backoff; JSON-object payloads only.
    */
  final class Client(
      transport: HttpTransport,
      baseUrl: String,
      retries: Int = 4,
      backoffSeconds: Double = 1.5,
      sleeper: Long => Unit = Thread.sleep) {

    def endpointUrl(endpoint: String): String =
      baseUrl.stripSuffix("/") + "/" + endpoint.stripPrefix("/")

    def getOnePage(endpoint: String, params: Map[String, String]): (Option[JsonNode], Option[Int], Option[String], Double) = {
      var lastError: Option[String] = None
      var lastStatus: Option[Int] = None
      var elapsed = 0.0
      var attempt = 1
      while (attempt <= retries) {
        try {
          val r = transport.get(endpointUrl(endpoint), params)
          elapsed += r.elapsedSeconds
          lastStatus = Some(r.statusCode)
          if (r.statusCode == 429 || (r.statusCode >= 500 && r.statusCode <= 599)) {
            lastError = Some(s"HTTP ${r.statusCode}: retryable response")
            if (attempt < retries) sleeper((backoffSeconds * attempt * 1000).toLong)
          } else if (r.statusCode >= 400) {
            return (None, lastStatus, Some(s"HTTP ${r.statusCode}"), elapsed)
          } else {
            val payload = mapper.readTree(r.body)
            if (payload == null || !payload.isObject)
              return (None, lastStatus, Some("Expected JSON object payload"), elapsed)
            return (Some(payload), lastStatus, None, elapsed)
          }
        } catch {
          case e: Exception =>
            lastError = Some(s"${e.getClass.getSimpleName}: ${e.getMessage}")
            if (attempt < retries) sleeper((backoffSeconds * attempt * 1000).toLong)
        }
        attempt += 1
      }
      (None, lastStatus, lastError, elapsed)
    }

    /** Offset-paginated fetch with the reference's merge and stop-reason
      * machinery (client.py:76-261).
      */
    def getPaginated(endpoint: String, params: Map[String, String],
                     maxPages: Int = DefaultMaxPages,
                     maxRows: Option[Int] = None): ApiSummary = {
      val pageSize = math.min(
        params.get("limit").flatMap(v => scala.util.Try(v.toInt).toOption).filter(_ > 0)
          .getOrElse(DefaultPageSize),
        DefaultPageSize)
      val initialSkip = params.get("skip").flatMap(v => scala.util.Try(v.toInt).toOption)
        .filter(_ >= 0).getOrElse(0)

      val combined = Vector.newBuilder[JsonNode]
      var fetched = 0
      var pageCount = 0
      var reportedTotal: Option[Long] = None
      val seenSignatures = mutable.Set.empty[String]
      var stopReason: String = null
      var lastStatus: Option[Int] = None

      def pagination(complete: Boolean, reason: String, limited: Boolean) =
        Pagination(complete, pageCount, pageSize, initialSkip, fetched,
          reportedTotal, reason, limited)

      def fail(reason: String, err: String) =
        ApiSummary(endpoint, ok = false, lastStatus, Some(err), Vector.empty,
          pagination(complete = false, reason, limited = false))

      while (pageCount < maxPages && stopReason == null) {
        val pageParams = params ++ Map(
          "limit" -> pageSize.toString, "skip" -> (initialSkip + fetched).toString)
        val (payloadOpt, status, err, _) = getOnePage(endpoint, pageParams)
        pageCount += 1
        lastStatus = status
        payloadOpt match {
          case None =>
            return fail("page_error", s"Pagination failed on page $pageCount: ${err.getOrElse(status.getOrElse("?"))}")
          case Some(payload) =>
            val resultsNode = payload.get("results")
            if (resultsNode == null || !resultsNode.isArray)
              return fail("invalid_results_shape",
                s"Expected list payload.results on page $pageCount")
            val results = resultsNode.asInstanceOf[ArrayNode]
            reportedTotal = reportedTotalOf(payload, reportedTotal)

            val sig = pageSignature(results)
            if (results.size > 0 && seenSignatures.contains(sig))
              return fail("repeated_page",
                s"Pagination made no progress: page $pageCount repeated a prior result page")
            seenSignatures += sig

            var i = 0
            while (i < results.size) { combined += results.get(i); fetched += 1; i += 1 }

            if (maxRows.exists(fetched >= _)) stopReason = "max_rows"
            else if (results.size == 0) stopReason = "empty_page"
            else if (reportedTotal.exists(initialSkip + fetched >= _)) stopReason = "reported_total_reached"
            else if (results.size < pageSize) stopReason = "short_page"
        }
      }
      if (stopReason == null) stopReason = "max_pages"

      val limited = stopReason == "max_rows"
      val complete = Set("empty_page", "reported_total_reached", "short_page")(stopReason)
      val resultsAll0 = combined.result()
      val resultsAll = maxRows.map(resultsAll0.take).getOrElse(resultsAll0)
      val pag = Pagination(complete, pageCount, pageSize, initialSkip,
        resultsAll.size, reportedTotal, stopReason, limited)
      if (!complete && !limited)
        ApiSummary(endpoint, ok = false, lastStatus,
          Some(s"Pagination did not complete: $stopReason"), Vector.empty, pag)
      else
        ApiSummary(endpoint, ok = true, lastStatus, None, resultsAll, pag)
    }
  }

  /** Reported-total extraction (client.py:336-359): head.counts.*,
    * pagination.*, top-level keys; keep the max seen so far.
    */
  private[sources] def reportedTotalOf(payload: JsonNode, current: Option[Long]): Option[Long] = {
    def intsOf(node: JsonNode, keys: Seq[String]): Seq[Long] =
      if (node == null) Nil
      else keys.flatMap { k =>
        val v = node.get(k)
        if (v != null && v.canConvertToLong && v.asLong >= 0) Some(v.asLong)
        else if (v != null && v.isTextual) scala.util.Try(v.asText.toLong).toOption.filter(_ >= 0)
        else None
      }
    val head = payload.get("head")
    val counts = if (head != null) head.get("counts") else null
    val candidates =
      intsOf(counts, Seq("totalCount", "total_count", "totalRecords")) ++
        intsOf(payload.get("pagination"), Seq("totalCount", "total_count", "total", "totalRecords")) ++
        intsOf(payload, Seq("totalCount", "total_count", "totalRecords"))
    if (candidates.isEmpty) current
    else Some(math.max(candidates.max, current.getOrElse(Long.MinValue)))
  }

  /** Page signature (client.py:362-366): count + first + last. */
  private[sources] def pageSignature(results: ArrayNode): String =
    if (results.size == 0) "empty"
    else s"${results.size}|${results.get(0)}|${results.get(results.size - 1)}"

  /** S2 adaptive date-partitioned fetch (partitioned_fetch.py:11-87):
    * on offset-ceiling failure (page_error mentioning 422), bisect the
    * inclusive [date_start, date_end] window — left ends at the midpoint,
    * right starts the next day — to bounded depth, then concatenate.
    */
  def getDatePartitioned(client: Client, endpoint: String,
                         params: Map[String, String], maxDepth: Int = 12): ApiSummary = {
    var partitionCount = 0

    def isOffsetCeiling(s: ApiSummary): Boolean =
      s.pagination.stopReason == "page_error" && s.error.exists(_.contains("422"))

    def parseDate(v: Option[String]): Option[LocalDate] =
      v.flatMap(s => scala.util.Try(LocalDate.parse(s)).toOption)

    def fetch(winParams: Map[String, String], depth: Int): ApiSummary = {
      val summary = client.getPaginated(endpoint, winParams)
      if (summary.ok) { partitionCount += 1; return summary }
      if (!isOffsetCeiling(summary) || depth >= maxDepth) return summary
      (parseDate(winParams.get("date_start")), parseDate(winParams.get("date_end"))) match {
        case (Some(start), Some(end)) if start.isBefore(end) =>
          val mid = start.plusDays(java.time.temporal.ChronoUnit.DAYS.between(start, end) / 2)
          val left = fetch(winParams +
            ("date_start" -> start.toString, "date_end" -> mid.toString), depth + 1)
          if (!left.ok) return left
          val right = fetch(winParams +
            ("date_start" -> mid.plusDays(1).toString, "date_end" -> end.toString), depth + 1)
          if (!right.ok) return right
          val pag = left.pagination.copy(
            complete = true,
            pageCount = left.pagination.pageCount + right.pagination.pageCount,
            fetchedCount = left.results.size + right.results.size,
            stopReason = "date_partitions_complete",
            partitioned = true,
            partitionCount = partitionCount)
          ApiSummary(endpoint, ok = true, right.statusCode.orElse(left.statusCode), None,
            left.results ++ right.results, pag)
        case _ => summary
      }
    }

    val out = fetch(params, 0)
    if (out.ok) out.copy(pagination = out.pagination.copy(
      partitioned = partitionCount > 1, partitionCount = partitionCount))
    else out
  }

  /** Materialize fetched JSON rows as a DataFrame (schema inferred by the
    * Spark JSON reader — declared StructTypes belong to the table specs).
    */
  def toDataFrame(spark: SparkSession, summary: ApiSummary): DataFrame = {
    import spark.implicits._
    spark.read.json(spark.createDataset(summary.results.map(_.toString)))
  }
}
