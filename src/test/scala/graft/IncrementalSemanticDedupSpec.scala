package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** Incremental SemDeDup: corpus-trained cells, batch judged against
  * corpus cell-mates AND lower-id batch-mates, least-match evidence.
  */
class IncrementalSemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private def blob(center: Array[Double], i: Int): Seq[Double] =
    center.toIndexedSeq.zipWithIndex.map { case (c, d) => c + 0.01 * ((i * 7 + d) % 5) }
  private val centers = Seq(
    Array(10.0, 0.0, 0.0, 0.0),
    Array(0.0, 10.0, 0.0, 0.0),
    Array(0.0, 0.0, 10.0, 0.0))
  // corpus: three tight blobs, ids interleaved (first-k seeds one per blob)
  private lazy val corpusRows = (0 until 30).map(i => (i.toLong, blob(centers(i % 3), i)))
  private lazy val corpus = corpusRows.toDF("vec_id", "embedding")

  // batch: two corpus near-copies (ids 101/102), a second copy of the
  // same source (103 — matched by corpus AND batch-mate 101; least
  // wins), and a novel direction (8,6,0,0) planted twice (104 kept,
  // 105 its batch-dup): cos ≈ 0.8 to blob 0 — below the 0.9 threshold
  // but decisively nearest cell 0, so the batch leg alone judges it
  private lazy val novel = Seq(8.0, 6.0, 0.0, 0.0)
  private lazy val batchRows: Seq[(Long, Seq[Double])] = Seq(
    (101L, corpusRows(4)._2.map(_ * 1.001)),
    (102L, corpusRows(5)._2.map(_ * 1.002)),
    (103L, corpusRows(4)._2.map(_ * 1.003)),
    (104L, novel),
    (105L, novel.map(_ * 1.001)))
  private lazy val batch = batchRows.toDF("vec_id", "embedding")

  private lazy val result =
    SimilarityOps.incrementalSemanticDedup(batch, corpus, "vec_id", "embedding",
        k = 3, maxIter = 10, t2 = 0.81)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(2)) -1L else r.getLong(2)), r.getBoolean(3))).toMap

  test("one verdict per batch vector; corpus ids never appear") {
    assert(result.keySet == Set(101L, 102L, 103L, 104L, 105L))
  }

  test("corpus matches point at the lowest same-cell corpus id") {
    // 101 copies corpus 4 (blob 1, all mutually cos≈1): min corpus id
    // in that cell is 1; same for 102 in blob 2
    assert(result(101L) == (1L, false))
    assert(result(102L) == (2L, false))
  }

  test("a vector matched by corpus AND batch-mate takes the least id") {
    // 103 matches corpus blob 1 (min id 1) and batch-mate 101
    assert(result(103L) == (1L, false))
  }

  test("the batch leg judges novel directions the corpus cannot match") {
    assert(result(104L) == (-1L, true), "first novel vector survives")
    assert(result(105L) == (104L, false), "its batch-mate dedupes against it")
  }

  test("cell cap: a hot corpus cell stops the corpus leg; the batch leg still judges") {
    // cap 5 < corpus blob widths (10) → no corpus matches; batch cells
    // are width ≤ 2 → 103 now dedupes against batch-mate 101 instead of
    // corpus id 1, and the novel pair still dedupes
    val capped = SimilarityOps.incrementalSemanticDedup(batch, corpus,
        "vec_id", "embedding", k = 3, maxIter = 10, t2 = 0.81, maxCell = 5)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(2)) -1L else r.getLong(2)), r.getBoolean(3))).toMap
    assert(capped(101L) == (-1L, true))
    assert(capped(102L) == (-1L, true))
    assert(capped(103L) == (101L, false))
    assert(capped(104L) == (-1L, true))
    assert(capped(105L) == (104L, false))
  }

  test("deterministic under repartitioning") {
    val again = SimilarityOps.incrementalSemanticDedup(
        batch.repartition(3), corpus.repartition(7), "vec_id", "embedding",
        k = 3, maxIter = 10, t2 = 0.81)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(2)) -1L else r.getLong(2)), r.getBoolean(3))).toMap
    assert(again == result)
  }
}
