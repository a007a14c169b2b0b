package graft

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.functions._

import graft.operators.FlattenOps
import graft.sources.RestSource
import graft.sources.v2.TransportFactory

/** Deterministic stub API: 3 items/day over 2024-01-01..2024-03-30,
  * limit/skip pagination, reported totals, and a simulated offset
  * ceiling (HTTP 422) for any window wider than 40 items — forcing the
  * in-task date bisection exactly like the reference API's behavior.
  * Instantiated BY CLASS NAME on the executor (must be top-level).
  */
class StubRestTransportFactory extends TransportFactory {
  override def create(): RestSource.HttpTransport = new RestSource.HttpTransport {
    private val mapper = new ObjectMapper()
    private val allDates = (0 until 90).map(java.time.LocalDate.of(2024, 1, 1).plusDays(_))

    override def get(url: String, params: Map[String, String]): RestSource.HttpResult = {
      val ds = params.get("date_start").map(java.time.LocalDate.parse)
      val de = params.get("date_end").map(java.time.LocalDate.parse)
      val dates = allDates.filter(d =>
        ds.forall(s => !d.isBefore(s)) && de.forall(e => !d.isAfter(e)))
      val items = dates.flatMap(d => (0 until 3).map(j => (d, j)))
      if (items.size > 40)
        return RestSource.HttpResult(422, """{"error":"offset ceiling"}""")
      val limit = params.get("limit").map(_.toInt).getOrElse(200)
      val skip = params.get("skip").map(_.toInt).getOrElse(0)
      val page = items.slice(skip, skip + limit).map { case (d, j) =>
        s"""{"bill":{"uri":"/bill/${d}-$j","date":"$d"}}"""
      }
      val body =
        s"""{"head":{"counts":{"totalCount":${items.size}}},
           |"results":[${page.mkString(",")}]}""".stripMargin.replaceAll("\n", "")
      mapper.readTree(body) // sanity: stub must emit valid JSON
      RestSource.HttpResult(200, body)
    }
  }
}

/** The DataSourceV2 REST scan: partition planning by calendar window,
  * per-task pagination + bisection, and composition with the flatten
  * engine — ingest runs inside the Spark plan.
  */
class RestDataSourceV2Spec extends SparkSpec {

  private def read(windowDays: Int) = spark.read
    .format("graft.sources.v2.RestDataSource")
    .option("endpoint", "legislation")
    .option("baseUrl", "https://stub.example")
    .option("transportFactory", "graft.StubRestTransportFactory")
    .option("dateStart", "2024-01-01")
    .option("dateEnd", "2024-03-30")
    .option("windowDays", windowDays.toString)
    .option("param.limit", "10")
    .load()

  test("plans one input partition per date window") {
    assert(read(30).rdd.getNumPartitions == 3)
    assert(read(7).rdd.getNumPartitions == 13)  // 90 days / 7 → 12 full + 1 rump
    assert(read(365).rdd.getNumPartitions == 1)
  }

  test("fetches every row exactly once across windows, ceilings, and pages") {
    // every 30-day window holds 90 items > the 40-item ceiling, so each
    // task must bisect; pages of 10 exercise offset paging underneath
    val df = read(30)
    assert(df.count() == 270)
    val ids = df.select(get_json_object(col("json"), "$.bill.uri").as("uri"))
    assert(ids.distinct().count() == 270)
  }

  test("composes with the flatten engine downstream") {
    val flat = FlattenOps.flatten(read(30), "json",
      FlattenOps.FlattenSpec(
        wrapperKeys = Seq("bill"),
        fields = Seq(
          FlattenOps.FieldSpec("bill_uri", Seq("uri")),
          FlattenOps.FieldSpec("bill_date", Seq("date")))))
    val rows = flat.groupBy("bill_date").count()
    assert(rows.count() == 90)
    assert(rows.agg(sum("count")).collect().head.getLong(0) == 270)
  }

  test("missing date range degrades to a single offset-paged partition") {
    // a window under the ceiling (no dates → whole corpus > ceiling would
    // 422; restrict via params instead)
    val df = spark.read
      .format("graft.sources.v2.RestDataSource")
      .option("endpoint", "legislation")
      .option("baseUrl", "https://stub.example")
      .option("transportFactory", "graft.StubRestTransportFactory")
      .option("param.limit", "10")
      .option("param.date_start", "2024-01-01")
      .option("param.date_end", "2024-01-10")
      .load()
    assert(df.rdd.getNumPartitions == 1)
    assert(df.count() == 30)
  }
}
