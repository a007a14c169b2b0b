package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.TableRegistry
import graft.functions.Fns
import graft.io.BatchStore
import graft.operators.FlattenOps.{FieldSpec, FlattenSpec}
import graft.silver.SilverBuilder
import graft.sources.RestSource
import graft.sources.RestSource.{HttpResult, HttpTransport}

/** End-to-end lifecycle test: stubbed REST pages → flatten → upsert merge
  * → DQ → batch-routed csv/parquet writes → manifest → promote → read
  * back through the production pointer → incremental second batch.
  */
class SilverBuilderSpec extends SparkSpec {

  private val spec = TableRegistry.specs("silver_members")

  private val flattenSpec = FlattenSpec(
    wrapperKeys = Seq("member", "person"),
    fields = Seq(
      FieldSpec("member_code", Seq("memberCode", "code")),
      FieldSpec("full_name", Seq("fullName", "showAs")),
      FieldSpec("is_current_member", Seq("isCurrent"), default = "false")))

  private def transportFor(pages: Seq[String]) = new HttpTransport {
    private val q = scala.collection.mutable.Queue(pages: _*)
    def get(url: String, params: Map[String, String]): HttpResult =
      HttpResult(200, if (q.nonEmpty) q.dequeue() else """{"results":[]}""")
  }

  private def fetchFrom(pages: Seq[String])() =
    new RestSource.Client(transportFor(pages), "https://api.test", sleeper = _ => ())
      .getPaginated("/members", Map("limit" -> "100"))

  test("full lifecycle: build → promote → resolve → incremental upsert") {
    val root = Files.createTempDirectory("graft_silver").toString
    val store = BatchStore.local(root, () => "2026-01-01T00:00:00+00:00")
    val transform = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("source_hash", Fns.stableHash(16, col("member_code"), col("full_name")))

    // batch 1: two members
    val r1 = SilverBuilder.build(spark, store, root, "b1", spec, flattenSpec,
      fetchFrom(Seq(
        """{"results":[{"member":{"memberCode":"m1","fullName":"Alice","isCurrent":"true"}},
          |{"person":{"code":"m2","showAs":"Bob"}}]}""".stripMargin.replaceAll("\n", ""))),
      transform, snapshotDate = "2026-01-01")
    assert(r1.ok && r1.dqStatus == "pass" && r1.rowCount == 2)

    store.assembleBatchManifest("b1", Seq("silver_members"))
    store.promoteBatch("b1")
    val resolved = store.resolveProductionKey("latest/parquet/silver_members.parquet")
    val t1 = spark.read.parquet(s"$root/$resolved")
    assert(t1.count() == 2)
    assert(t1.filter(col("member_code") === "m1").select("full_name")
      .collect().head.getString(0) == "Alice")

    // batch 2: m2 renamed + m3 new → upsert keeps m1, updates m2, adds m3
    val r2 = SilverBuilder.build(spark, store, root, "b2", spec, flattenSpec,
      fetchFrom(Seq(
        """{"results":[{"member":{"memberCode":"m2","fullName":"Bobby","isCurrent":"true"}},
          |{"member":{"memberCode":"m3","fullName":"Cara"}}]}""".stripMargin.replaceAll("\n", ""))),
      transform, snapshotDate = "2026-02-01")
    assert(r2.ok && r2.rowCount == 3)

    store.assembleBatchManifest("b2", Seq("silver_members"))
    store.promoteBatch("b2")
    val t2 = spark.read.parquet(
      s"$root/${store.resolveProductionKey("latest/parquet/silver_members.parquet")}")
    val byCode = t2.collect().map(r => r.getAs[String]("member_code") -> r.getAs[String]("full_name")).toMap
    assert(byCode == Map("m1" -> "Alice", "m2" -> "Bobby", "m3" -> "Cara"))

    // rollback: previous pointer returns the b1 view
    store.rollbackPrevious()
    val t3 = spark.read.parquet(
      s"$root/${store.resolveProductionKey("latest/parquet/silver_members.parquet")}")
    assert(t3.count() == 2)
  }

  test("failed fetch short-circuits without writes") {
    val root = Files.createTempDirectory("graft_silver2").toString
    val store = BatchStore.local(root)
    val badTransport = new HttpTransport {
      def get(url: String, params: Map[String, String]) = HttpResult(500, "boom")
    }
    val r = SilverBuilder.build(spark, store, root, "b1", spec, flattenSpec,
      () => new RestSource.Client(badTransport, "https://api.test", retries = 2, sleeper = _ => ())
        .getPaginated("/members", Map("limit" -> "10")),
      identity, snapshotDate = "2026-01-01")
    assert(!r.ok && r.stopReason == "page_error")
    assert(store.readJsonIfExists(store.batchEntryKey("b1", "silver_members")).isEmpty)
  }
}
