package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** k-means coarse-quantizer training: deterministic seeding, exact
  * integer Lloyd steps, convergence on separable blobs, and the wiring
  * into the IVF ANN path (trained cells instead of precomputed labels).
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated 4-dim blobs; ids interleave the blobs so the
  // first-k seeding starts with one seed per blob
  private def blob(center: Array[Double], i: Int): Seq[Double] =
    center.toIndexedSeq.zipWithIndex.map { case (c, d) => c + 0.001 * ((i * 7 + d) % 5) }
  private val centers = Seq(
    Array(10.0, 0.0, 0.0, 0.0),
    Array(0.0, 10.0, 0.0, 0.0),
    Array(0.0, 0.0, 10.0, 0.0))
  private lazy val vecs = (0 until 90)
    .map(i => (i.toLong, blob(centers(i % 3), i)))
    .toDF("vec_id", "embedding")

  test("kmeansTrain converges to one centroid per blob") {
    val cents = SimilarityOps.kmeansTrain(vecs, "vec_id", "embedding", k = 3, maxIter = 20)
    assert(cents.size == 3)
    // each trained centroid sits at one blob center (quantized 1e6 scale,
    // blob jitter ≤ 0.004 → within 5000 quantized units)
    val matched = centers.map { c =>
      cents.exists(q => q.zip(c).forall { case (qc, cc) =>
        math.abs(qc - (cc * 1e6).toLong) < 5000 })
    }
    assert(matched.forall(identity))
  }

  test("assignment groups every vector with its blob and feeds the IVF ANN path") {
    val cents = SimilarityOps.kmeansTrain(vecs, "vec_id", "embedding", k = 3, maxIter = 20)
    val labeled = SimilarityOps.kmeansAssign(vecs, "vec_id", "embedding", cents)
    // all members of a blob land in the same trained cell
    val cellsPerBlob = labeled
      .groupBy((col("vec_id") % 3).as("blob"))
      .agg(countDistinct(col("cell")).as("n_cells"))
      .collect().map(_.getLong(1))
    assert(cellsPerBlob.forall(_ == 1L))
    // the cell-restricted ANN runs on trained cells and only returns
    // same-blob neighbors
    val ann = SimilarityOps.topKWithinPartition(labeled, "vec_id", "embedding", "cell", k = 2)
    assert(ann.filter(col("query_id") % 3 =!= col("neighbor_id") % 3).count() == 0)
    assert(ann.groupBy("query_id").count().filter(col("count") =!= 2).count() == 0)
  }

  test("an emptied cell keeps its centroid and can re-acquire members") {
    // identical seeds: the tie-break sends EVERY vector to cell 0 on the
    // first step, so cell 1 empties (keeps its (0,0) centroid) — then
    // re-acquires the origin pair once cell 0's centroid drifts between
    // the groups
    val tiny = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(0.0, 0.0)),
      (2L, Seq(5.0, 5.0)), (3L, Seq(5.0, 5.001))).toDF("vec_id", "embedding")
    val cents = SimilarityOps.kmeansTrain(tiny, "vec_id", "embedding", k = 2, maxIter = 10)
    assert(cents.size == 2)
    assert(cents(1).forall(_ == 0L))
    assert(cents(0).forall(_ > 4000000L))
  }
}
