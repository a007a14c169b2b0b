package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword retrieval for a training-data pipeline: BM25 scoring over an
  * inverted-postings view of the corpus, plus reciprocal-rank fusion for
  * hybrid (keyword + vector) retrieval.
  *
  * The reference has no keyword-search operator; this is part of the
  * beyond-reference LLM-pipeline tier (near-dup mining, decontamination
  * and eval-set leakage checks all want "which training docs score high
  * for this query" in BOTH lexical and embedding space).
  *
  * Scale design (100 TB):
  *  - Tokenization is the corpus-wide [[DedupOps.normText]] convention —
  *    expression-only, whole-stage codegen, no per-doc state.
  *  - Postings are a (term, doc) groupBy with map-side partial counts.
  *  - The query workload is broadcast; postings are pruned to query
  *    terms by a broadcast semi-join BEFORE any per-term statistics, so
  *    corpus-wide work is one scan regardless of query count.
  *  - df(term) is computed from the pruned postings (identical to the
  *    full-corpus value: pruning filters whole terms, never docs).
  *  - Per-term contributions are quantized to longs (floor(x·1e6)) and
  *    summed as integers — commutative and exact, so scores are
  *    independent of Spark's aggregation order and bit-identical to any
  *    other engine evaluating the same per-term double expression.
  *  - The final per-query top-k runs as a bounded insertion inside one
  *    [[org.apache.spark.sql.KeyValueGroupedDataset.flatMapGroups]] pass
  *    (O(k) memory per query), never a sort of the full candidate set —
  *    a common query term can make the candidate set the whole corpus.
  */
object SearchOps {

  private def words(text: Column): Column =
    filter(split(DedupOps.normText(text), " "), w => w =!= "")

  /** Tokenized docs: (doc_id long, ws array<string>), empty docs dropped. */
  def tokenized(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"), words(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= 1)

  /** Deterministic query workload derived from the corpus itself: every
    * `everyNth`-th doc contributes the distinct terms among its first
    * `prefixTokens` tokens. Returns (query_id long, term string).
    */
  def derivedQueries(docs: DataFrame, textCol: String, idCol: String,
                     everyNth: Int, prefixTokens: Int): DataFrame =
    tokenized(docs.filter(col(idCol) % everyNth === 0), textCol, idCol)
      .select(col("doc_id").as("query_id"),
        explode(array_distinct(slice(col("ws"), 1, prefixTokens))).as("term"))

  /** The one BM25 contribution expression, shared by the in-memory and
    * prepared paths so their scores are definitionally identical (and
    * both mirror the oracle SQL tree node for node).
    */
  private def bm25Contrib(tf: Column, df: Column, dl: Column,
                          nDocs: Column, totalLen: Column,
                          k1: Double, b: Double): Column =
    floor(log(((nDocs - df) + lit(0.5)) / (df + lit(0.5)) + lit(1.0))
      * ((tf * lit(k1 + 1.0)) /
         (tf + lit(k1) * (lit(1.0 - b) + lit(b) * ((dl * nDocs) / totalLen))))
      * lit(1000000.0)).cast("long")

  /** BM25 top-k per query. `queries` is (query_id, term) — duplicate
    * terms within a query are collapsed (standard bag-of-terms BM25 with
    * unit query tf). Returns (query_id, doc_id, score long, rank long),
    * rank 1..topK by (score desc, doc_id asc).
    *
    * The score is the integer sum of per-term contributions
    * floor(1e6 · idf(t) · tfNorm(t, d)) with the Robertson/Sparck-Jones
    * plus-one idf: ln(((N − df + 0.5) / (df + 0.5)) + 1) — always
    * positive, so pruned candidates can only lose by absence, and the
    * bounded top-k needs no negative-score handling.
    *
    * `excludeSelf` drops doc_id == query_id rows (for derived-from-corpus
    * workloads where the query doc itself is a degenerate hit).
    */
  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
               queries: DataFrame, topK: Int,
               k1: Double = 1.2, b: Double = 0.75,
               excludeSelf: Boolean = false): DataFrame = {
    val toks = tokenized(docs, textCol, idCol)
    // two corpus scalars; exact in double (counts and integer sums < 2^53)
    val stats = toks.select(size(col("ws")).cast("double").as("dl"))
      .agg(count(lit(1)).cast("double").as("n_docs"), sum(col("dl")).as("total_len"))

    // postings CARRY the doc length (constant per doc, so max() under the
    // same groupBy) — no corpus-sized doc-length join downstream
    val post = toks.select(col("doc_id"), size(col("ws")).cast("double").as("dl"),
        explode(col("ws")).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).cast("double").as("tf"), max(col("dl")).as("dl"))
    val qterms = queries.select(col("query_id").cast("long").as("query_id"),
      col("term")).distinct()

    // prune the corpus to query terms FIRST — everything downstream is
    // proportional to the matched postings, not the corpus
    val cand = post.join(broadcast(qterms.select("term").distinct()), "term")
    val dft = cand.groupBy("term").agg(count(lit(1)).cast("double").as("df"))

    // per-(term, doc) contribution as an exact long; the double tree
    // must mirror the oracle SQL verbatim (see queries/Retrieval.scala)
    val contrib = cand.join(broadcast(dft), "term")
      .crossJoin(broadcast(stats))
      .withColumn("c", bm25Contrib(col("tf"), col("df"), col("dl"),
        col("n_docs"), col("total_len"), k1, b))
      .join(broadcast(qterms), "term")

    val scored = contrib.groupBy("query_id", "doc_id").agg(sum(col("c")).as("score"))
    val base = if (excludeSelf) scored.filter(col("query_id") =!= col("doc_id")) else scored
    boundedTopK(base, topK)
  }

  /** Persist the postings as one BUCKETED table `<prefix>_postings`
    * (term, doc_id, tf, dl — bucketed+sorted by term; tf/dl stored as
    * exact longs) with the two corpus scalars as table properties. The
    * serving analog of the corpus dedup index (DedupOps §prepared):
    * tokenize + postings-groupBy are paid ONCE at build time; a bucketed
    * scan reports its hash partitioning on term, so every serve-time
    * operation that keys on term — the broadcast query-term prune AND
    * the df aggregation — plans with ZERO corpus-side exchange. At
    * 100 TB that corpus shuffle is exactly what the prepared index
    * exists to avoid. An explicit `path` makes the table EXTERNAL so
    * the files outlive an in-memory catalog.
    */
  def writePostingsIndex(docs: DataFrame, textCol: String, idCol: String,
                         tablePrefix: String, buckets: Int = 64,
                         path: Option[String] = None): Unit = {
    val spark = docs.sparkSession
    val toks = tokenized(docs, textCol, idCol)
    val statsRow = toks.select(size(col("ws")).cast("long").as("dl"))
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("l")).head()
    val post = toks.select(col("doc_id"), size(col("ws")).cast("long").as("dl"),
        explode(col("ws")).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    // one file per bucket (same murmur3 repartition-then-bucketBy trick
    // as the dedup index writer — see DedupOps.writeBucketedIndexTable)
    def writeBucketed(df: DataFrame, name: String): Unit = {
      val w0 = df.repartition(buckets, col("term"))
        .write.bucketBy(buckets, "term").sortBy("term").mode("overwrite")
      path.fold(w0)(p => w0.option("path", s"$p/$name"))
        .saveAsTable(s"${tablePrefix}_$name")
    }
    writeBucketed(post, "postings")
    // per-term document frequency precomputed at BUILD time: without it
    // every serve re-aggregates (and therefore re-scans) the postings a
    // second time just to count df over the matched terms
    writeBucketed(post.groupBy("term").agg(count(lit(1)).as("df")), "termstats")
    spark.sql(s"ALTER TABLE ${tablePrefix}_postings SET TBLPROPERTIES (" +
      s"'graft.bm25.n_docs'='${statsRow.getLong(0)}'," +
      s"'graft.bm25.total_len'='${statsRow.getLong(1)}')")
  }

  def postingsIndexExists(spark: org.apache.spark.sql.SparkSession,
                          tablePrefix: String): Boolean =
    spark.catalog.tableExists(s"${tablePrefix}_postings") &&
      spark.catalog.tableExists(s"${tablePrefix}_termstats")

  /** [[bm25TopK]] served from a persisted postings index: same scores
    * by construction (stored tf/dl are exact longs cast back to double;
    * the corpus scalars ride the table properties; the contribution
    * expression is the shared [[bm25Contrib]] with the scalars baked in
    * as plan literals). Per-query work is proportional to the MATCHED
    * postings — the corpus is never re-tokenized and never shuffled.
    */
  def bm25TopKPrepared(spark: org.apache.spark.sql.SparkSession,
                       tablePrefix: String, queries: DataFrame, topK: Int,
                       k1: Double = 1.2, b: Double = 0.75,
                       excludeSelf: Boolean = false): DataFrame = {
    val post = spark.table(s"${tablePrefix}_postings")
    val props = spark.sql(s"SHOW TBLPROPERTIES ${tablePrefix}_postings")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val nDocs = props("graft.bm25.n_docs").toLong.toDouble
    val totalLen = props("graft.bm25.total_len").toLong.toDouble
    val qterms = queries.select(col("query_id").cast("long").as("query_id"),
      col("term")).distinct()
    val cand = post.join(broadcast(qterms.select("term").distinct()), "term")
    // df comes from the build-time termstats table (same value as an
    // on-the-fly count: term pruning filters whole terms, never docs),
    // pruned to query terms and broadcast — the postings are read ONCE
    val dft = spark.table(s"${tablePrefix}_termstats")
      .join(broadcast(qterms.select("term").distinct()), "term")
      .select(col("term"), col("df").cast("double").as("df"))
    val contrib = cand.join(broadcast(dft), "term")
      .withColumn("c", bm25Contrib(col("tf").cast("double"), col("df"),
        col("dl").cast("double"), lit(nDocs), lit(totalLen), k1, b))
      .join(broadcast(qterms), "term")
    val scored = contrib.groupBy("query_id", "doc_id").agg(sum(col("c")).as("score"))
    val base = if (excludeSelf) scored.filter(col("query_id") =!= col("doc_id")) else scored
    boundedTopK(base, topK)
  }

  /** Per-query bounded top-k by (score desc, doc_id asc): one shuffle on
    * query_id, O(k) state per query — no full candidate sort.
    */
  private[graft] def boundedTopK(scored: DataFrame, topK: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored.select(col("query_id").cast("long"), col("doc_id").cast("long"),
        col("score").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val ids = new Array[Long](topK)
        val scs = new Array[Long](topK)
        var filled = 0
        it.foreach { case (_, did, sc) =>
          // insertion position under (score desc, doc_id asc)
          var pos = filled
          while (pos > 0 && (scs(pos - 1) < sc || (scs(pos - 1) == sc && ids(pos - 1) > did))) pos -= 1
          if (pos < topK) {
            val last = math.min(filled, topK - 1)
            var j = last
            while (j > pos) { ids(j) = ids(j - 1); scs(j) = scs(j - 1); j -= 1 }
            ids(pos) = did; scs(pos) = sc
            if (filled < topK) filled += 1
          }
        }
        (0 until filled).iterator.map(i => (qid, ids(i), scs(i), (i + 1).toLong))
      }
      .toDF("query_id", "doc_id", "score", "rank")
  }

  /** Brute-force cosine top-k for an explicit query subset (asymmetric
    * [[SimilarityOps.bruteTopK]]): O(|Q|·n) dot products — the exact
    * oracle for fusion; at scale feed [[rrfFuse]] from the IVF/PQ index
    * paths instead. Returns (query_id, doc_id, rank).
    */
  def cosineTopKFor(queries: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, topK: Int): DataFrame = {
    val toD = (c: Column) => transform(c, x => x.cast("double"))
    val nrm = (v: Column) => sqrt(aggregate(v, lit(0.0), (a, x) => a + x * x))
    val q = queries.select(col(idCol).cast("long").as("query_id"), toD(col(vecCol)).as("qv"))
      .withColumn("qn", nrm(col("qv")))
    val c = corpus.select(col(idCol).cast("long").as("doc_id"), toD(col(vecCol)).as("cv"))
      .withColumn("cn", nrm(col("cv")))
    val scored = broadcast(q).join(c, col("query_id") =!= col("doc_id"))
      .withColumn("score",
        aggregate(zip_with(col("qv"), col("cv"), (x, y) => x * y), lit(0.0), (a, x) => a + x)
          / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select(col("query_id"), col("doc_id"), col("rank").cast("long").as("rank"))
  }

  /** Reciprocal-rank fusion over any number of (query_id, doc_id, rank)
    * rankings: fused(d) = Σ_lists floor(1e6 / (rrfK + rank)) — integer
    * division, so fused scores are exact longs with no float hazard.
    * Returns (query_id, doc_id, fused long, rank long) top-k per query
    * by (fused desc, doc_id asc). Absence from a list contributes 0.
    */
  def rrfFuse(rankings: Seq[DataFrame], topK: Int, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    // integer DIV on both engines (Spark DIV / DuckDB //) — a double
    // division + cast would round differently (Spark truncates, DuckDB
    // rounds) and 1e6/(k+rank) is not exactly representable
    val normed = rankings.map(_.selectExpr(
      "CAST(query_id AS BIGINT) AS query_id",
      "CAST(doc_id AS BIGINT) AS doc_id",
      s"CAST(1000000L DIV (${rrfK}L + CAST(rank AS BIGINT)) AS BIGINT) AS c"))
    val fused = normed.reduce(_ union _)
      .groupBy("query_id", "doc_id").agg(sum(col("c")).as("score"))
    boundedTopK(fused, topK).withColumnRenamed("score", "fused")
  }
}
