package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]). Brute-force cosine top-k is the correctness baseline;
  * the partitioned variant is the scale path (IVF-style: restrict the
  * search to a coarse cell, here a precomputed cluster label).
  *
  * All arithmetic is promoted to double and folded sequentially
  * (functions.aggregate) so scores are deterministic.
  */
object SimilarityOps {

  /** Cast a float vector column to double for deterministic math. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(v: Column): Column = sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k neighbors for every vector: O(n²) dot
    * products via self-join. The per-query top-k is a window over the
    * candidate set — at scale prefer [[topKWithinPartition]] or an
    * LSH/IVF candidate generator feeding the same ranking.
    */
  def bruteTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val v = emb.select(col(idCol).cast("long").as("vid"), toDouble(col(vecCol)).as("vd"))
      .withColumn("nrm", norm(col("vd")))
    val q = v.select(col("vid").as("query_id"), col("vd").as("qv"), col("nrm").as("qn"))
    val c = v.select(col("vid").as("neighbor_id"), col("vd").as("cv"), col("nrm").as("cn"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("score", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
  }

  /** IVF-style partitioned top-k: candidates restricted to the query's
    * coarse cell (label column). Turns the O(n²) cross join into
    * per-cell joins — the shuffle is keyed by cell, and cells are
    * independent (perfectly parallel at 1000 executors).
    */
  def topKWithinPartition(emb: DataFrame, idCol: String, vecCol: String,
                          cellCol: String, k: Int): DataFrame = {
    val v = emb.select(col(cellCol).as("cell"), col(idCol).cast("long").as("vid"),
      toDouble(col(vecCol)).as("vd"))
      .withColumn("nrm", norm(col("vd")))
    val q = v.select(col("cell"), col("vid").as("query_id"), col("vd").as("qv"), col("nrm").as("qn"))
    val c = v.select(col("cell"), col("vid").as("neighbor_id"), col("vd").as("cv"), col("nrm").as("cn"))
    val scored = q.join(c, Seq("cell")).filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("cell"), col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
  }

  /** Random-hyperplane LSH bucket id (sign bits of hash-derived planes):
    * a deterministic, data-independent coarse cell for when no label
    * exists. planeSeed × dim hashes stand in for gaussian components —
    * adequate bucketing for ANN candidate generation at scale.
    */
  def hyperplaneBucket(vec: Column, numPlanes: Int): Column = {
    val planes = (0 until numPlanes).map { p =>
      // pseudo-random ±1 components: sign of xxhash64(p, dim_index)
      val contrib = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => when(xxhash64(lit(p), i).bitwiseAND(lit(1L)) === 0, x).otherwise(-x)),
        lit(0.0), (acc, x) => acc + x)
      when(contrib > 0, lit(1L << p)).otherwise(lit(0L))
    }
    planes.reduce((a, b) => a.bitwiseOR(b))
  }
}
