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

    // S1 offset pagination + S2 date-bisection through the REAL client
    // (graft.sources.RestSource) over a deterministic stub transport
    // whose pages are slices of the nation table: one row per scenario
    // capturing merge results (first/last/sum of fetched keys), stop
    // reason, page accounting, retry attempts, and the bisection's
    // partition fan-out — all reconstructible from `nation` plus the
    // client's documented arithmetic in plain SQL.
    "q105_rest_pagination_parity" -> ((s, dir) => {
      import graft.sources.RestSource
      import s.implicits._
      val data = t(s, dir, "nation")
        .select(col("n_nationkey").cast("long"), col("n_name"))
        .orderBy("n_nationkey")
        .collect().map(r => (r.getLong(0), r.getString(1))).toIndexedSeq
      def body(slice: Seq[(Long, String)], total: Option[Long]): String =
        StableJson.write(Map("results" ->
          slice.map { case (k, n) => Map("k" -> k, "name" -> n) }) ++
          total.map(t => "head" -> Map("counts" -> Map("totalCount" -> t))))
      def sliceOf(rows: IndexedSeq[(Long, String)], params: Map[String, String]) =
        rows.slice(params("skip").toInt, params("skip").toInt + params("limit").toInt)
      trait CountingTransport extends RestSource.HttpTransport { var calls = 0L }
      // paged stub: optional reported total, N leading 500s, or a stuck
      // pager that always serves page one
      class Stub(rows: IndexedSeq[(Long, String)], total: Option[Long] = None,
                 fail500First: Int = 0, stuck: Boolean = false)
          extends CountingTransport {
        def get(url: String, params: Map[String, String]): RestSource.HttpResult = {
          calls += 1
          if (calls <= fail500First) RestSource.HttpResult(500, "transient")
          else RestSource.HttpResult(200, body(
            if (stuck) rows.take(params("limit").toInt) else sliceOf(rows, params),
            total))
        }
      }
      // bisection stub: 422 on any window wider than one day; each day
      // serves the keys ≡ (day-1) mod 4, via the same offset pager
      class BisectStub extends CountingTransport {
        def get(url: String, params: Map[String, String]): RestSource.HttpResult = {
          calls += 1
          val start = java.time.LocalDate.parse(params("date_start"))
          val end = java.time.LocalDate.parse(params("date_end"))
          if (java.time.temporal.ChronoUnit.DAYS.between(start, end) > 0)
            RestSource.HttpResult(422, "offset ceiling")
          else RestSource.HttpResult(200, body(sliceOf(
            data.filter(_._1 % 4 == start.getDayOfMonth - 1), params), None))
        }
      }
      // deeper bisection stub over a 7-day calendar (day d serves keys
      // ≡ d-1 mod 7): 422 above `maxSpan` days models an uneven split
      // tree ([1-2][3-4][5-7] for maxSpan=2 over 7 days); always422
      // exhausts maxDepth; fail500Day plants a NON-ceiling failure that
      // must abort the bisection instead of splitting further
      class BisectStub7(maxSpan: Long, always422: Boolean = false,
                        fail500Day: Option[Int] = None) extends CountingTransport {
        def get(url: String, params: Map[String, String]): RestSource.HttpResult = {
          calls += 1
          val start = java.time.LocalDate.parse(params("date_start"))
          val end = java.time.LocalDate.parse(params("date_end"))
          if (always422 ||
              java.time.temporal.ChronoUnit.DAYS.between(start, end) > maxSpan)
            RestSource.HttpResult(422, "offset ceiling")
          else if (fail500Day.contains(start.getDayOfMonth))
            RestSource.HttpResult(500, "blown shard")
          else {
            val days = (start.getDayOfMonth to end.getDayOfMonth).map(d => (d - 1).toLong).toSet
            RestSource.HttpResult(200,
              body(sliceOf(data.filter(r => days(r._1 % 7)), params), None))
          }
        }
      }
      def client(tr: RestSource.HttpTransport) =
        new RestSource.Client(tr, "http://stub", sleeper = _ => ())
      val page10 = Map("limit" -> "10")
      def run(name: String, tr: CountingTransport)
             (f: RestSource.Client => RestSource.ApiSummary) = {
        val sm = f(client(tr))
        val keys = sm.results.map(_.get("k").asLong)
        (name, sm.ok, sm.pagination.stopReason, sm.pagination.complete,
          sm.pagination.intentionallyLimited,
          sm.pagination.pageCount.toLong, sm.pagination.fetchedCount.toLong,
          sm.pagination.reportedTotal,
          if (keys.isEmpty) None else Some(keys.head),
          if (keys.isEmpty) None else Some(keys.last),
          if (keys.isEmpty) None else Some(keys.sum),
          sm.pagination.partitionCount.toLong, tr.calls, sm.error)
      }
      val rows = Seq(
        run("a_full", new Stub(data))(_.getPaginated("e", page10)),
        run("b_retry", new Stub(data, fail500First = 1))(_.getPaginated("e", page10)),
        run("c_skip", new Stub(data))(_.getPaginated("e", page10 ++ Map("skip" -> "20"))),
        run("d_max_rows", new Stub(data))(_.getPaginated("e", page10, maxRows = Some(12))),
        run("e_reported_total", new Stub(data, total = Some(data.size.toLong)))(
          _.getPaginated("e", page10)),
        run("f_empty", new Stub(Vector.empty))(_.getPaginated("e", page10)),
        run("g_repeated", new Stub(data, stuck = true))(_.getPaginated("e", page10)),
        run("h_max_pages", new Stub(data))(_.getPaginated("e", page10, maxPages = 2)),
        run("i_bisect", new BisectStub)(c => RestSource.getDatePartitioned(c, "e",
          page10 ++ Map("date_start" -> "2024-01-01", "date_end" -> "2024-01-04"))),
        // uneven tree: [1-4] still 422s, its halves and [5-7] succeed →
        // three partitions of different widths, 5 transport calls
        run("j_bisect_uneven", new BisectStub7(maxSpan = 2))(c =>
          RestSource.getDatePartitioned(c, "e",
            page10 ++ Map("date_start" -> "2024-01-01", "date_end" -> "2024-01-07"))),
        // every window 422s → the depth cap stops the recursion and the
        // deepest left leg's ceiling failure surfaces as-is (3 calls)
        run("k_bisect_depth", new BisectStub7(maxSpan = 0, always422 = true))(c =>
          RestSource.getDatePartitioned(c, "e",
            page10 ++ Map("date_start" -> "2024-01-01", "date_end" -> "2024-01-07"),
            maxDepth = 2)),
        // a NON-ceiling failure (persistent 500, 4 retry attempts) inside
        // a bisected leg aborts the whole fetch instead of splitting
        run("l_bisect_abort", new BisectStub7(maxSpan = 0, fail500Day = Some(1)))(c =>
          RestSource.getDatePartitioned(c, "e",
            page10 ++ Map("date_start" -> "2024-01-01", "date_end" -> "2024-01-02"))))
      rows.toDF("scenario", "ok", "stop_reason", "complete", "limited",
          "page_count", "fetched_count", "reported_total", "first_key",
          "last_key", "sum_keys", "partition_count", "transport_calls", "error")
        .orderBy("scenario")
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

    // q105: every scenario's merge results and page accounting rebuilt
    // from `nation` (pageSize 10 arithmetic; stop reasons, error strings
    // and the bisection fan-out are the client's documented contract)
    "q105_rest_pagination_parity" ->
      """WITH n AS (SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation),
        |tot AS (SELECT COUNT(*) AS c, CAST(SUM(k) AS BIGINT) AS sk, MIN(k) AS mn, MAX(k) AS mx FROM n),
        |sk20 AS (SELECT COUNT(*) AS c, CAST(SUM(k) AS BIGINT) AS sk, MIN(k) AS mn, MAX(k) AS mx FROM n WHERE k >= 20),
        |t12 AS (SELECT COUNT(*) AS c, CAST(SUM(k) AS BIGINT) AS sk, MIN(k) AS mn, MAX(k) AS mx
        |  FROM (SELECT k FROM n ORDER BY k LIMIT 12)),
        |d1 AS (SELECT MIN(k) AS mn FROM n WHERE k % 4 = 0),
        |d4 AS (SELECT MAX(k) AS mx FROM n WHERE k % 4 = 3),
        |-- uneven bisection partitions: first key of [day1-2] (k%7 in 0,1),
        |-- last key of [day5-7] (k%7 in 4,5,6)
        |j1 AS (SELECT MIN(k) AS mn FROM n WHERE k % 7 <= 1),
        |j2 AS (SELECT MAX(k) AS mx FROM n WHERE k % 7 >= 4)
        |SELECT * FROM (
        |  SELECT 'a_full' AS scenario, true AS ok, 'short_page' AS stop_reason,
        |    true AS complete, false AS limited, c // 10 + 1 AS page_count,
        |    c AS fetched_count, CAST(NULL AS BIGINT) AS reported_total,
        |    mn AS first_key, mx AS last_key, sk AS sum_keys,
        |    CAST(0 AS BIGINT) AS partition_count, c // 10 + 1 AS transport_calls,
        |    CAST(NULL AS VARCHAR) AS error FROM tot
        |  UNION ALL
        |  SELECT 'b_retry', true, 'short_page', true, false, c // 10 + 1, c,
        |    NULL, mn, mx, sk, 0, c // 10 + 2, NULL FROM tot
        |  UNION ALL
        |  SELECT 'c_skip', true, 'short_page', true, false, 1, c,
        |    NULL, mn, mx, sk, 0, 1, NULL FROM sk20
        |  UNION ALL
        |  SELECT 'd_max_rows', true, 'max_rows', false, true, 2, c,
        |    NULL, mn, mx, sk, 0, 2, NULL FROM t12
        |  UNION ALL
        |  SELECT 'e_reported_total', true, 'reported_total_reached', true, false,
        |    c // 10 + 1, c, c, mn, mx, sk, 0, c // 10 + 1, NULL FROM tot
        |  UNION ALL
        |  SELECT 'f_empty', true, 'empty_page', true, false, 1, 0,
        |    NULL, NULL, NULL, NULL, 0, 1, NULL
        |  UNION ALL
        |  SELECT 'g_repeated', false, 'repeated_page', false, false, 2, LEAST(c, 10),
        |    NULL, NULL, NULL, NULL, 0, 2,
        |    'Pagination made no progress: page 2 repeated a prior result page' FROM tot
        |  UNION ALL
        |  SELECT 'h_max_pages', false, 'max_pages', false, false, 2, LEAST(c, 20),
        |    NULL, NULL, NULL, NULL, 0, 2,
        |    'Pagination did not complete: max_pages' FROM tot
        |  UNION ALL
        |  SELECT 'i_bisect', true, 'date_partitions_complete', true, false, 4,
        |    tot.c, NULL, d1.mn, d4.mx, tot.sk, 4, 7, NULL FROM tot, d1, d4
        |  UNION ALL
        |  SELECT 'j_bisect_uneven', true, 'date_partitions_complete', true, false, 3,
        |    tot.c, NULL, j1.mn, j2.mx, tot.sk, 3, 5, NULL FROM tot, j1, j2
        |  UNION ALL
        |  SELECT 'k_bisect_depth', false, 'page_error', false, false, 1, 0,
        |    NULL, NULL, NULL, NULL, 0, 3, 'Pagination failed on page 1: HTTP 422'
        |  UNION ALL
        |  SELECT 'l_bisect_abort', false, 'page_error', false, false, 1, 0,
        |    NULL, NULL, NULL, NULL, 0, 5,
        |    'Pagination failed on page 1: HTTP 500: retryable response')
        |ORDER BY scenario""".stripMargin,
  )
}
