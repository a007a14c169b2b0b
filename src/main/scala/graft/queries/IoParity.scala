package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.io.{StableJson, TableIO}
import graft.operators.MergeOps

/** Driver-oracle rows for the I/O boundary operators previously verified
  * only by ScalaTest (SURVEY §2.1 M4, S7+S5, S9): each query runs the
  * REAL file machinery — staged parquet swap, BOM'd CSV single-file
  * write, canonical JSON — against a scratch dir derived from the sf
  * dir, then returns the read-back rows so the DuckDB oracle can model
  * the expected end state in plain SQL.
  */
object IoParity {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Fresh scratch path under java.io.tmpdir, keyed to the sf dir so
    * parallel verifies over different SFs never collide; deleted up
    * front so every evaluation starts from the same (empty) state.
    */
  private def scratch(dir: String, name: String): java.io.File = {
    val f = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_${name}_${Integer.toHexString(dir.hashCode)}")
    org.apache.commons.io.FileUtils.deleteQuietly(f)
    f
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // M4 read-modify-write "latest" through the staged-swap sink, run
    // twice (reference io_s3.py:118-145 + merge.py:14-30): call 1 seeds
    // the target from an empty existing side, call 2 merges an update
    // batch through MergeOps.upsert (incoming wins on pk), and the
    // returned frame is the parquet READ BACK from the swapped target —
    // so the oracle checks the file lifecycle (stage → delete → rename)
    // end-to-end, not just the merge arithmetic.
    "q97_merge_into_latest" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val target = scratch(dir, "q97").getPath
      val batch1 = o.filter(col("o_orderkey") % 7 < 5)
        .select(col("o_orderkey").cast("long").as("pk"),
          col("o_orderstatus").as("status"),
          col("o_totalprice").as("price"),
          lit(1L).as("ver"))
      val batch2 = o.filter(col("o_orderkey") % 7 >= 3)
        .select(col("o_orderkey").cast("long").as("pk"),
          lower(col("o_orderstatus")).as("status"),
          (col("o_totalprice") + 1.0d).as("price"),
          lit(2L).as("ver"))
      TableIO.mergeIntoLatest(s, batch1, target)(MergeOps.upsert(_, _, Seq("pk")))
      TableIO.mergeIntoLatest(s, batch2, target)(MergeOps.upsert(_, _, Seq("pk")))
      s.read.parquet(target).orderBy("pk")
    }),

    // S7 BOM CSV sink + S5 all-string source, round-tripped: quoting
    // (embedded comma + double quote), blank-vs-value strings
    // (keep_default_na=False semantics — a blank cell reads back as ''
    // not null), and the UTF-8 BOM asserted on the written bytes. The
    // oracle reproduces the pre-write strings — hash equality proves
    // the writer/reader pair is lossless.
    "q98_csv_bom_roundtrip" -> ((s, dir) => {
      val n = t(s, dir, "nation")
      val target = new java.io.File(scratch(dir, "q98"), "nation.csv").getPath
      val src = n.select(
        col("n_nationkey").cast("string").as("key"),
        concat(col("n_name"), lit(",\"x\"")).as("tricky"),
        when(col("n_nationkey") % 3 === 0, lit(""))
          .otherwise(col("n_name")).as("maybe_blank"))
      TableIO.writeCsv(src, target, bom = true)
      val head = {
        val in = new java.io.FileInputStream(target)
        try { val b = new Array[Byte](3); in.read(b); b } finally in.close()
      }
      require(java.util.Arrays.equals(head,
        Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)),
        "q98: written CSV lacks the UTF-8 BOM")
      TableIO.readCsvAllString(s, target, Seq("key", "tricky", "maybe_blank"))
        .orderBy(col("key"))
    }),

    // S9 canonical JSON, stability proven IN the query: two Spark-built
    // JSON encodings of the same record with REVERSED field orders must
    // canonicalize to the same bytes (sorted keys), and canonicalizing
    // the canonical form must be a fixed point — both checked per row
    // with a loud require. The oracle rebuilds the canonical string by
    // concatenation (sorted keys, compact separators, longs unquoted).
    "q99_stable_json_roundtrip" -> ((s, dir) => {
      val stable = udf((a: String, b: String) => {
        val wa = StableJson.write(StableJson.parse(a))
        val wb = StableJson.write(StableJson.parse(b))
        require(wa == wb, s"q99: key-order instability: $wa vs $wb")
        require(StableJson.write(StableJson.parse(wa)) == wa,
          s"q99: canonical form is not a fixed point: $wa")
        wa
      })
      val n = t(s, dir, "nation")
      val j1 = to_json(struct(
        col("n_nationkey").cast("long").as("k"),
        col("n_name").as("name"),
        array(col("n_regionkey").cast("long"), lit(2L)).as("arr")))
      val j2 = to_json(struct(
        array(col("n_regionkey").cast("long"), lit(2L)).as("arr"),
        col("n_name").as("name"),
        col("n_nationkey").cast("long").as("k")))
      n.select(col("n_nationkey").cast("long").as("n_nationkey"),
          stable(j1, j2).as("canon"))
        .orderBy("n_nationkey")
    }),

    // S10 batch pointer router + F4 injectable clock, full lifecycle
    // against REAL pointer files (reference extract/oireachtas/batch.py;
    // ops-tool port scale — one table per nation row, driver-side like
    // the reference script): record + assemble + promote b1, then a
    // batch with DQ failures whose manifest must assemble FAILED and
    // whose promote must refuse, then promote b3 and roll back to b1
    // through the previous pointer. Every resolved path and every
    // timestamp (fixed clock) is reconstructed by the oracle.
    "q100_batch_pointer_router" -> ((s, dir) => {
      import s.implicits._
      val root = scratch(dir, "q100").getPath
      val store = graft.io.BatchStore.local(root, () => "2026-01-02T03:04:05Z")
      val keys = t(s, dir, "nation").select(col("n_nationkey").cast("long"))
        .as[Long].collect().sorted.toSeq
      val tables = keys.map(k => s"t$k")
      def logical(k: Long) = s"latest/parquet/t$k.parquet"
      def seed(b: String, dq: Long => String): Unit = {
        keys.foreach { k =>
          store.putJson(store.batchKeyForProductionKey(logical(k), b),
            Map("rows" -> k))
          store.recordBatchTable(b, s"t$k", rowCount = k * 10, dqStatus = dq(k),
            primaryKey = Seq("id"), columns = Seq("id", "v"),
            candidateKeys = Seq(logical(k)))
        }
      }
      seed("b1", _ => "pass")
      val m1 = store.assembleBatchManifest("b1", tables)
      store.promoteBatch("b1", actor = "q100")
      val resolved1 = keys.map(k => k -> store.resolveProductionKey(logical(k))).toMap
      seed("b2", k => if (k % 5 == 0) "fail" else "pass")
      val m2 = store.assembleBatchManifest("b2", tables)
      val b2Promotion =
        try { store.promoteBatch("b2", actor = "q100"); "promoted" }
        catch { case _: IllegalArgumentException => "refused" }
      seed("b3", _ => "pass")
      store.assembleBatchManifest("b3", tables)
      store.promoteBatch("b3", actor = "q100")
      val resolved3 = keys.map(k => k -> store.resolveProductionKey(logical(k))).toMap
      val rb = store.rollbackPrevious(actor = "q100")
      val resolvedRb = keys.map(k => k -> store.resolveProductionKey(logical(k))).toMap
      keys.map(k => (s"t$k",
          String.valueOf(m1("status")),
          String.valueOf(m2("status")),
          if (k % 5 == 0) "failed" else "validated",
          b2Promotion,
          resolved1(k), resolved3(k), resolvedRb(k),
          String.valueOf(rb("rolled_back_from_batch_id")),
          String.valueOf(rb("promoted_at_utc"))))
        .toDF("table_name", "b1_manifest_status", "b2_manifest_status",
          "b2_entry_status", "b2_promotion", "resolved_b1", "resolved_b3",
          "resolved_after_rollback", "rolled_back_from", "promoted_at_utc")
        .orderBy("table_name")
    }),

    // S11 review bundle round-tripped: writeReviewBundle emits a sample
    // CSV (first N of the ordered input), a canonical schema.json, and
    // a dq.json next to it; the query reads all three back (CSV through
    // the S5 all-string reader, JSONs as raw canonical bytes) so the
    // oracle can reconstruct the sample rows AND both JSON documents by
    // string concatenation.
    "q101_review_bundle" -> ((s, dir) => {
      val n = t(s, dir, "nation")
      val bundleDir = new java.io.File(scratch(dir, "q101"), "bundle").getPath
      val src = n.select(col("n_nationkey").cast("string").as("key"),
          col("n_name").as("name"))
        .orderBy(col("key"))
      TableIO.writeReviewBundle(src, bundleDir, sampleRows = 10,
        dq = Map("row_count" -> 25L, "status" -> "pass"))
      def readText(p: String): String = {
        val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
        new String(bytes, "UTF-8")
      }
      val schemaJson = readText(s"$bundleDir/schema.json")
      val dqJson = readText(s"$bundleDir/dq.json")
      TableIO.readCsvAllString(s, s"$bundleDir/sample.csv", Seq("key", "name"))
        .withColumn("schema_json", lit(schemaJson))
        .withColumn("dq_json", lit(dqJson))
        .orderBy(col("key"))
    }),
  )

  def oracles: Map[String, String] = Map(

    "q97_merge_into_latest" ->
      """WITH b1 AS (
        |  SELECT o_orderkey AS pk, o_orderstatus AS status,
        |    o_totalprice AS price, CAST(1 AS BIGINT) AS ver
        |  FROM orders WHERE o_orderkey % 7 < 5),
        |b2 AS (
        |  SELECT o_orderkey AS pk, lower(o_orderstatus) AS status,
        |    o_totalprice + 1.0 AS price, CAST(2 AS BIGINT) AS ver
        |  FROM orders WHERE o_orderkey % 7 >= 3)
        |SELECT pk, status, price, ver FROM b2
        |UNION ALL
        |SELECT pk, status, price, ver FROM b1
        |WHERE pk NOT IN (SELECT pk FROM b2)
        |ORDER BY pk""".stripMargin,

    "q98_csv_bom_roundtrip" ->
      """SELECT CAST(n_nationkey AS VARCHAR) AS key,
        |  n_name || ',"x"' AS tricky,
        |  CASE WHEN n_nationkey % 3 = 0 THEN '' ELSE n_name END AS maybe_blank
        |FROM nation
        |ORDER BY key""".stripMargin,

    "q99_stable_json_roundtrip" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
        |  '{"arr":[' || CAST(n_regionkey AS VARCHAR) || ',2],"k":' ||
        |    CAST(n_nationkey AS VARCHAR) || ',"name":"' || n_name || '"}' AS canon
        |FROM nation
        |ORDER BY n_nationkey""".stripMargin,

    "q100_batch_pointer_router" ->
      """SELECT 't' || CAST(n_nationkey AS VARCHAR) AS table_name,
        |  'validated' AS b1_manifest_status,
        |  'failed' AS b2_manifest_status,
        |  CASE WHEN n_nationkey % 5 = 0 THEN 'failed' ELSE 'validated' END
        |    AS b2_entry_status,
        |  'refused' AS b2_promotion,
        |  'batches/b1/tables/t' || CAST(n_nationkey AS VARCHAR) || '/parquet/t'
        |    || CAST(n_nationkey AS VARCHAR) || '.parquet' AS resolved_b1,
        |  'batches/b3/tables/t' || CAST(n_nationkey AS VARCHAR) || '/parquet/t'
        |    || CAST(n_nationkey AS VARCHAR) || '.parquet' AS resolved_b3,
        |  'batches/b1/tables/t' || CAST(n_nationkey AS VARCHAR) || '/parquet/t'
        |    || CAST(n_nationkey AS VARCHAR) || '.parquet' AS resolved_after_rollback,
        |  'b3' AS rolled_back_from,
        |  '2026-01-02T03:04:05Z' AS promoted_at_utc
        |FROM nation
        |ORDER BY table_name""".stripMargin,

    "q101_review_bundle" ->
      """SELECT CAST(n_nationkey AS VARCHAR) AS key, n_name AS name,
        |  '{"columns":["key","name"],"types":{"key":"string","name":"string"}}'
        |    AS schema_json,
        |  '{"row_count":25,"status":"pass"}' AS dq_json
        |FROM nation
        |ORDER BY key
        |LIMIT 10""".stripMargin,
  )
}
