package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.TableRegistry
import graft.io.BatchStore
import graft.silver.{FlattenSpecs, SilverBuilder}
import graft.sources.RestSource
import graft.sources.RestSource.{HttpResult, HttpTransport}

/** Integration coverage closing two round-1 gaps: the satellite flatten
  * specs plugged through the full SilverBuilder lifecycle (fetch →
  * flatten → transform → registry conform → DQ → batch write), and S4
  * object listing via Spark's binaryFile source.
  */
class SatelliteBuildSpec extends SparkSpec {

  private def transportFor(pages: Seq[String]) = new HttpTransport {
    private val q = scala.collection.mutable.Queue(pages: _*)
    def get(url: String, params: Map[String, String]): HttpResult =
      HttpResult(200, if (q.nonEmpty) q.dequeue() else """{"results":[]}""")
  }

  test("silver_bill_stages builds end-to-end through the registry spec") {
    val root = Files.createTempDirectory("satellite-build").toString
    val store = BatchStore.local(root, () => "2026-01-01T00:00:00Z")
    val spec = TableRegistry.specs("silver_bill_stages")
    val page =
      """{"results":[{"bill":{"uri":"/bill/1","stages":[
        |{"event":{"showAs":"First Stage","dates":[{"date":"2024-01-10"}],
        | "progressStage":"1","house":{"uri":"/h/33","showAs":"Dáil"}}},
        |{"event":{"showAs":"Second Stage","dates":[{"date":"2024-02-10"}],
        | "progressStage":"2","house":{"uri":"/h/33","showAs":"Dáil"}}}
        |]}}],"head":{"counts":{"resultCount":1}}}""".stripMargin.replaceAll("\n", "")

    val fetch = () =>
      new RestSource.Client(transportFor(Seq(page)), "https://api.test", sleeper = _ => ())
        .getPaginated("/legislation", Map("limit" -> "100"))

    val result = SilverBuilder.build(spark, store, root, "batch-1", spec,
      FlattenSpecs.billStages, fetch,
      transform = FlattenSpecs.billStagesTransform, snapshotDate = "2026-01-01")

    assert(result.ok, result)
    assert(result.rowCount == 2)
    assert(result.dqStatus == "pass")

    // read back the batch parquet and check registry-conformed shape
    val written = spark.read.parquet(
      s"$root/${store.batchKeyForProductionKey(s"latest/parquet/${spec.name}.parquet", "batch-1")}")
    assert(written.columns.toSeq == spec.columns)
    val rows = written.orderBy("order_in_bill").collect()
    assert(rows.map(_.getAs[String]("stage_name")).toSeq == Seq("First Stage", "Second Stage"))
    assert(rows.forall(_.getAs[String]("bill_id") == "/bill/1"))
    assert(rows.forall(_.getAs[String]("snapshot_date") == "2026-01-01"))
    // pk is the generated surrogate (no stage uri in payload)
    assert(rows.forall(_.getAs[String]("bill_stage_id").startsWith("generated:bill_stage:")))
  }

  test("S4: object listing via the binaryFile source") {
    val dir = Files.createTempDirectory("binfiles")
    Files.write(dir.resolve("a.pdf"), Array[Byte](0x25, 0x50, 0x44, 0x46))
    Files.write(dir.resolve("b.xml"), "<doc/>".getBytes("UTF-8"))
    val listed = spark.read.format("binaryFile").load(dir.toString)
      .select(col("path"), col("length"), col("content"))
      .orderBy("path").collect()
    assert(listed.length == 2)
    assert(listed(0).getAs[String]("path").endsWith("a.pdf"))
    assert(listed(0).getAs[Long]("length") == 4L)
    assert(new String(listed(1).getAs[Array[Byte]]("content"), "UTF-8") == "<doc/>")
  }
}
