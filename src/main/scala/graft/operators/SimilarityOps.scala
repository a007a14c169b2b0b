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

  /** IVF-style partitioned top-k: each coarse cell (label column) is
    * scored in one task over primitive arrays — no O(n²) shuffle rows,
    * JIT-compiled dot loops, cells perfectly parallel at 1000 executors.
    * Dot/norm accumulate left-to-right exactly like the column
    * expressions, so scores (and therefore ranks) are bit-identical to
    * the brute path. Cell cardinality bounds task memory (m·dim doubles);
    * at 100 TB pick the coarse quantizer so cells stay ~10⁴-10⁵ vectors.
    */
  def topKWithinPartition(emb: DataFrame, idCol: String, vecCol: String,
                          cellCol: String, k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val ds = emb.select(col(cellCol).cast("long").as("cell"),
      col(idCol).cast("long").as("vid"), toDouble(col(vecCol)).as("vd"))
      .as[(Long, Long, Seq[Double])]

    ds.groupByKey(_._1).flatMapGroups { (cell, it) =>
      val members = it.map { case (_, vid, vd) => (vid, vd.toArray) }.toArray
        .sortBy(_._1)
      val n = members.length
      val norms = new Array[Double](n)
      var i = 0
      while (i < n) {
        val a = members(i)._2
        var s = 0.0; var d = 0
        while (d < a.length) { s += a(d) * a(d); d += 1 }
        norms(i) = math.sqrt(s)
        i += 1
      }
      members.indices.iterator.flatMap { qi =>
        val (qid, qv) = members(qi)
        // bounded top-k insertion, ordered (score desc, neighbor_id asc)
        val topIds = new Array[Long](k)
        val topScores = new Array[Double](k)
        var filled = 0
        var ci = 0
        while (ci < n) {
          if (ci != qi) {
            val cv = members(ci)._2
            var s = 0.0; var d = 0
            while (d < cv.length) { s += qv(d) * cv(d); d += 1 }
            val score = s / (norms(qi) * norms(ci))
            val cid = members(ci)._1
            var pos = filled
            while (pos > 0 && (topScores(pos - 1) < score ||
              (topScores(pos - 1) == score && topIds(pos - 1) > cid))) pos -= 1
            if (pos < k) {
              val last = math.min(filled, k - 1)
              var j = last
              while (j > pos) { topIds(j) = topIds(j - 1); topScores(j) = topScores(j - 1); j -= 1 }
              topIds(pos) = cid; topScores(pos) = score
              if (filled < k) filled += 1
            }
          }
          ci += 1
        }
        (0 until filled).map(r => (cell, qid, topIds(r), (r + 1).toLong))
      }
    }.toDF("cell", "query_id", "neighbor_id", "rank")
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
