package graft

import scala.collection.mutable

import graft.sources.RestSource
import graft.sources.RestSource._

/** Ports of the reference pagination / bisection tests
  * (tests/test_oireachtas_pagination.py, test_oireachtas_partitioned_fetch.py)
  * against stubbed transports (zero-egress, as the reference stubs its
  * session).
  */
class RestSourceSpec extends SparkSpec {

  private class FakeTransport(pages: Seq[String], statuses: Seq[Int] = Nil) extends HttpTransport {
    private val queue = mutable.Queue(pages: _*)
    private val statusQueue = mutable.Queue(statuses: _*)
    val calls = mutable.ArrayBuffer.empty[Map[String, String]]
    def get(url: String, params: Map[String, String]): HttpResult = {
      calls += params
      val status = if (statusQueue.nonEmpty) statusQueue.dequeue() else 200
      if (queue.isEmpty) throw new AssertionError("unexpected extra page request")
      HttpResult(status, queue.dequeue())
    }
  }

  private def client(t: HttpTransport, retries: Int = 1) =
    new Client(t, "https://api.test/v1", retries = retries, sleeper = _ => ())

  test("merges pages until reported total (pagination:37-50)") {
    val t = new FakeTransport(Seq(
      """{"head":{"counts":{"totalCount":3}},"results":[{"id":1},{"id":2}]}""",
      """{"head":{"counts":{"totalCount":3}},"results":[{"id":3}]}"""))
    val s = client(t).getPaginated("/members", Map("limit" -> "2"))
    assert(s.ok)
    assert(s.results.map(_.get("id").asInt).toSeq == Seq(1, 2, 3))
    assert(t.calls.map(_("skip")).toSeq == Seq("0", "2"))
    assert(s.pagination.complete)
    assert(s.pagination.fetchedCount == 3)
    assert(s.pagination.stopReason == "reported_total_reached")
  }

  test("short page completes when total is unavailable (pagination:52-63)") {
    val t = new FakeTransport(Seq(
      """{"results":[{"id":1},{"id":2}]}""",
      """{"results":[{"id":3}]}"""))
    val s = client(t).getPaginated("/members", Map("limit" -> "2"))
    assert(s.ok)
    assert(s.pagination.stopReason == "short_page")
    assert(s.results.size == 3)
  }

  test("repeated page fails instead of looping (pagination:65-74)") {
    val page = """{"results":[{"id":1},{"id":2}]}"""
    val t = new FakeTransport(Seq(page, page))
    val s = client(t).getPaginated("/members", Map("limit" -> "2"), maxPages = 5)
    assert(!s.ok)
    assert(s.pagination.stopReason == "repeated_page")
    assert(s.error.exists(_.contains("made no progress")))
  }

  test("empty first page completes with empty results") {
    val t = new FakeTransport(Seq("""{"results":[]}"""))
    val s = client(t).getPaginated("/members", Map("limit" -> "2"))
    assert(s.ok && s.results.isEmpty && s.pagination.stopReason == "empty_page")
  }

  test("retries on 5xx then succeeds (client retry policy)") {
    val t = new FakeTransport(
      Seq("""boom""", """{"results":[{"id":1}]}"""), statuses = Seq(503, 200))
    val s = client(t, retries = 3).getPaginated("/members", Map("limit" -> "2"))
    assert(s.ok && s.results.size == 1)
    assert(t.calls.size == 2)
  }

  test("max_rows truncates and records intentional limitation (test-mode cap)") {
    val t = new FakeTransport(Seq("""{"results":[{"id":1},{"id":2}]}"""))
    val s = client(t).getPaginated("/members", Map("limit" -> "2"), maxRows = Some(1))
    assert(s.ok)
    assert(s.results.size == 1)
    assert(s.pagination.intentionallyLimited)
    assert(s.pagination.stopReason == "max_rows")
  }

  // --- date bisection (partitioned_fetch tests) ---

  /** Transport that 422s any window wider than `failSpansOverDays` and
    * otherwise returns one row carrying the window's date_start.
    */
  private class WindowTransport(failSpansOverDays: Int) extends HttpTransport {
    def get(url: String, params: Map[String, String]): HttpResult = {
      val start = java.time.LocalDate.parse(params("date_start"))
      val end = java.time.LocalDate.parse(params("date_end"))
      val span = java.time.temporal.ChronoUnit.DAYS.between(start, end) + 1
      if (span > failSpansOverDays) HttpResult(422, "offset ceiling")
      else HttpResult(200, s"""{"results":[{"id":"${params("date_start")}"}]}""")
    }
  }

  test("splits into non-overlapping daily partitions (partitioned_fetch:46-66)") {
    val c = client(new WindowTransport(1))
    val s = RestSource.getDatePartitioned(c, "/questions",
      Map("date_start" -> "2026-07-01", "date_end" -> "2026-07-04", "limit" -> "200"))
    assert(s.ok)
    assert(s.results.map(_.get("id").asText).toSeq ==
      Seq("2026-07-01", "2026-07-02", "2026-07-03", "2026-07-04"))
    assert(s.pagination.partitionCount == 4)
    assert(s.pagination.partitioned)
  }

  test("wider tolerance needs fewer partitions (partitioned_fetch:68-84)") {
    val c = client(new WindowTransport(2))
    val s = RestSource.getDatePartitioned(c, "/questions",
      Map("date_start" -> "2026-07-01", "date_end" -> "2026-07-04", "limit" -> "200"))
    assert(s.ok)
    assert(s.pagination.complete)
    assert(s.results.size == 2)
  }

  test("single-day offset failure is not hidden (partitioned_fetch:86-95)") {
    val c = client(new WindowTransport(0))
    val s = RestSource.getDatePartitioned(c, "/questions",
      Map("date_start" -> "2026-07-01", "date_end" -> "2026-07-01", "limit" -> "200"))
    assert(!s.ok)
    assert(s.error.exists(_.contains("422")))
  }

  test("fetched rows materialize as a DataFrame") {
    val t = new FakeTransport(Seq("""{"results":[{"id":1,"name":"a"},{"id":2,"name":"b"}]}"""))
    val s = client(t).getPaginated("/members", Map("limit" -> "5"))
    val df = RestSource.toDataFrame(spark, s)
    assert(df.count() == 2)
    assert(df.columns.sorted.toSeq == Seq("id", "name"))
  }
}
