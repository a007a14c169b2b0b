package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.{BatchStore, StableJson, TableIO}
import graft.operators.MergeOps

/** Ports of tests/test_oireachtas_batch_control.py over a local
  * filesystem root, plus IO-convention coverage (BOM CSV, all-string
  * read, staged latest merge).
  */
class BatchStoreSpec extends SparkSpec {
  import spark.implicits._

  private def newStore() = {
    val root = Files.createTempDirectory("graft_batch").toString
    (BatchStore.local(root, () => "2026-01-01T00:00:00+00:00"), root)
  }

  private def publishTable(store: BatchStore, batchId: String, table: String,
                           dq: String = "pass"): Unit = {
    val key = s"latest/csv/$table.csv"
    val batchKey = store.batchKeyForProductionKey(key, batchId)
    store.putJson(batchKey, Map("rows" -> 1L)) // stand-in object
    store.recordBatchTable(batchId, table, rowCount = 1, dqStatus = dq,
      primaryKey = Seq("id"), columns = Seq("id"), candidateKeys = Seq(key))
  }

  test("key mapping: latest/review/compat → immutable batch keys, unsafe rejected") {
    val (store, _) = newStore()
    assert(store.batchKeyForProductionKey("latest/csv/members.csv", "b1") ==
      "batches/b1/tables/members/csv/members.csv")
    assert(store.batchKeyForProductionKey("review/members/latest/sample.csv", "b1") ==
      "batches/b1/review/members/sample.csv")
    assert(store.batchKeyForProductionKey("compat/roster/roster.csv", "b1") ==
      "batches/b1/compat/roster/roster.csv")
    intercept[IllegalArgumentException](
      store.batchKeyForProductionKey("compat/../escape.csv", "b1"))
    intercept[IllegalArgumentException](
      store.batchKeyForProductionKey("random/key.csv", "b1"))
    intercept[IllegalArgumentException](BatchStore.validateBatchId("../evil"))
  }

  test("assemble validates: all pass → validated; missing/failed/dup → failed") {
    val (store, _) = newStore()
    publishTable(store, "b1", "members")
    publishTable(store, "b1", "votes")
    val ok = store.assembleBatchManifest("b1", Seq("members", "votes"))
    assert(ok("status") == "validated")
    assert(ok("table_count") == 2L)

    val m2 = store.assembleBatchManifest("b1", Seq("members", "votes", "speeches"))
    assert(m2("status") == "failed")

    publishTable(store, "b2", "members", dq = "fail")
    val m3 = store.assembleBatchManifest("b2", Seq("members"))
    assert(m3("status") == "failed")
  }

  test("promote repoints production; resolve routes reads; rollback restores") {
    val (store, _) = newStore()
    publishTable(store, "b1", "members")
    store.assembleBatchManifest("b1", Seq("members"))
    store.promoteBatch("b1", actor = "test")
    assert(store.resolveProductionKey("latest/csv/members.csv") ==
      "batches/b1/tables/members/csv/members.csv")

    publishTable(store, "b2", "members")
    store.assembleBatchManifest("b2", Seq("members"))
    store.promoteBatch("b2", actor = "test")
    assert(store.resolveProductionKey("latest/csv/members.csv") ==
      "batches/b2/tables/members/csv/members.csv")

    // rollback via previous pointer → back to b1
    val ptr = store.rollbackPrevious(actor = "test")
    assert(ptr("operation") == "rollback")
    assert(store.resolveProductionKey("latest/csv/members.csv") ==
      "batches/b1/tables/members/csv/members.csv")
  }

  test("racing promotes serialize: the losing generation never vanishes from the supersede chain") {
    // two unguarded promotes both read the same current pointer and both
    // record it as "previous" — the later writer's pointer then claims a
    // previous generation that skips the other promote entirely. Under
    // the pointer-swap claim the promotes serialize: whichever lands
    // second records the FIRST as its previous.
    val (store, _) = newStore()
    publishTable(store, "b0", "members")
    store.assembleBatchManifest("b0", Seq("members"))
    store.promoteBatch("b0", actor = "seed")
    Seq("b1", "b2").foreach { id =>
      publishTable(store, id, "members")
      store.assembleBatchManifest(id, Seq("members"))
    }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val latch = new java.util.concurrent.CountDownLatch(2)
    val threads = Seq("b1", "b2").map(id => new Thread(() => {
      latch.countDown(); latch.await()
      try store.promoteBatch(id, actor = s"racer-$id")
      catch { case t: Throwable => errs.add(t) }
    }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"racing promote threw: ${errs.peek()}")
    val prod = store.readJsonIfExists(store.productionPointerKey).get
    val prev = store.readJsonIfExists(store.previousPointerKey).get
    val winner = prod("batch_id").toString
    val loser = if (winner == "b1") "b2" else "b1"
    assert(Set("b1", "b2")(winner))
    // serialization witness: the final previous pointer is the OTHER
    // racer (superseded by the winner), not the b0 both started from
    assert(prev("batch_id").toString == loser,
      s"lost update: previous=${prev("batch_id")} skipped the $loser promote")
    assert(prev("superseded_by_batch_id").toString == winner)
    assert(prod("previous_batch_id").toString == loser)
  }

  test("promoting an unvalidated batch is refused") {
    val (store, _) = newStore()
    publishTable(store, "b9", "members", dq = "fail")
    store.assembleBatchManifest("b9", Seq("members"))
    intercept[IllegalArgumentException](store.promoteBatch("b9"))
  }

  test("rollback to legacy_direct mode resolves keys directly") {
    val (store, _) = newStore()
    publishTable(store, "b1", "members")
    store.assembleBatchManifest("b1", Seq("members"))
    store.promoteBatch("b1")
    store.rollbackBatch("legacy_direct")
    assert(store.resolveProductionKey("latest/csv/members.csv") == "latest/csv/members.csv")
  }

  test("stable json is key-sorted, compact, and round-trips") {
    val s = StableJson.write(Map("b" -> 2L, "a" -> Seq("x", "y"), "c" -> null))
    assert(s == """{"a":["x","y"],"b":2,"c":null}""")
    assert(StableJson.parse(s) == Map("a" -> Vector("x", "y"), "b" -> 2L, "c" -> null))
  }

  test("BOM csv write + all-string read round-trip") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val df = Seq(("m1", "FF"), ("m2", "")).toDF("member_code", "party")
    TableIO.writeCsv(df, s"$dir/members.csv", bom = true)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(s"$dir/members.csv"))
    assert(bytes.take(3).toSeq == Seq(0xEF.toByte, 0xBB.toByte, 0xBF.toByte))
    val back = TableIO.readCsvAllString(spark, s"$dir/members.csv", Seq("member_code", "party"))
      .orderBy("member_code").as[(String, String)].collect().toSeq
    assert(back == Seq(("m1", "FF"), ("m2", "")))
  }

  test("staged latest merge applies upsert policy atomically") {
    val dir = Files.createTempDirectory("graft_latest").toString + "/t"
    val first = Seq(("a", "1"), ("b", "1")).toDF("pk", "v")
    TableIO.mergeIntoLatest(spark, first, dir)(MergeOps.upsert(_, _, Seq("pk")))
    val second = Seq(("b", "2"), ("c", "1")).toDF("pk", "v")
    TableIO.mergeIntoLatest(spark, second, dir)(MergeOps.upsert(_, _, Seq("pk")))
    val out = spark.read.parquet(dir).orderBy("pk").as[(String, String)].collect().toSeq
    assert(out == Seq(("a", "1"), ("b", "2"), ("c", "1")))
  }

  test("dynamic partition overwrite replaces only the written partitions") {
    val dir = Files.createTempDirectory("graft_dyn").toString + "/t"
    val full = Seq(("2024-W01", "a", 1L), ("2024-W01", "b", 2L), ("2024-W02", "c", 3L))
      .toDF("week", "k", "v")
    TableIO.writeParquetPartitioned(full, dir, Seq("week"))
    val w2Files = new java.io.File(s"$dir/week=2024-W02").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSet

    // rewrite ONLY week 1 — week 2's files must be byte-identical (same names)
    val patch = Seq(("2024-W01", "a", 9L)).toDF("week", "k", "v")
    TableIO.writeParquetPartitioned(patch, dir, Seq("week"))

    val w2After = new java.io.File(s"$dir/week=2024-W02").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSet
    assert(w2After == w2Files, "untouched partition was rewritten")
    val out = spark.read.parquet(dir).orderBy("k")
      .select("week", "k", "v").as[(String, String, Long)].collect().toSeq
    assert(out == Seq(("2024-W01", "a", 9L), ("2024-W02", "c", 3L)))

    // readers prune: a week filter must reach the scan as a PartitionFilter
    val plan = spark.read.parquet(dir).filter($"week" === "2024-W02")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(week"), plan.take(800))
  }
}
