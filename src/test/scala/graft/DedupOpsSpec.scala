package graft

import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Hashed shingling must preserve the set relations of string shingling:
  * same set sizes per document and identical Jaccard per pair (collisions
  * are the only divergence mode, ~2⁻⁶⁴ per pair — a hit here means the
  * combine is broken, not bad luck).
  */
class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bend"),
    (3L, "a completely different document about spark aggregation pipelines"),
    (4L, "The  Quick   Brown fox JUMPS over the lazy dog near the river bank"), // = 1 after norm
    (5L, "short text"), // shorter than n → empty shingle set
    (6L, "one two three one two three one two three") // repeated n-grams collapse
  ).toDF("doc_id", "text")

  test("simhash banding refuses a radius the 4-band pigeonhole cannot cover") {
    val sig = Seq((1L, 0L), (2L, 15L)).toDF("doc_id", "simhash")
    val e = intercept[IllegalArgumentException] {
      DedupOps.simhashNearDupPairs(sig, maxHamming = 4)
    }
    assert(e.getMessage.contains("hamming"), e.getMessage)
    // radius 3 remains the working contract
    assert(DedupOps.simhashNearDupPairs(sig, maxHamming = 3).count() >= 0)
  }

  test("embedding LSH refuses vectors whose length disagrees with dim") {
    val emb = Seq(
      (1L, Array.fill(8)(0.5f).toSeq),
      (2L, Array.fill(16)(0.5f).toSeq)   // wrong length
    ).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      DedupOps.lshEmbeddingNearDupPairs(emb, "vec_id", "embedding", dim = 8,
        bands = 2, planesPerBand = 4).count()
    }
    // the executor-side require surfaces through Spark's task failure
    assert(e.getMessage.contains("dim=8") ||
      Option(e.getCause).exists(_.getMessage.contains("dim=8")), e.toString)
  }

  test("hashed shingle sets have the same cardinality as string shingle sets") {
    val both = docs.select(col("doc_id"),
        size(DedupOps.shingles(col("text"), 3)).as("n_str"),
        size(DedupOps.shingleHashes(col("text"), 3)).as("n_hash"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    both.foreach { case (id, s, h) => assert(s == h, s"doc $id: $s vs $h") }
  }

  test("pairwise Jaccard identical under string and hashed shingles") {
    def pairs(shingleExpr: org.apache.spark.sql.Column) = {
      val sh = docs.select(col("doc_id"), shingleExpr.as("sg"))
        .filter(size(col("sg")) > 0)
      val a = sh.select(col("doc_id").as("doc_a"), col("sg").as("sg_a"))
      val b = sh.select(col("doc_id").as("doc_b"), col("sg").as("sg_b"))
      a.join(b, col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          DedupOps.jaccard(col("sg_a"), col("sg_b")).as("j"))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    }
    val js = pairs(DedupOps.shingles(col("text"), 3))
    val jh = pairs(DedupOps.shingleHashes(col("text"), 3))
    assert(js == jh && js((1L, 4L)) == 1.0 && js((1L, 2L)) > 0.5)
  }

  test("brute and minhash near-dup paths agree on the fixture") {
    val brute = DedupOps.bruteNearDupPairs(docs, "text", "doc_id", 3, 0.5)
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val lsh = DedupOps.minhashNearDupPairs(docs, "text", "doc_id", 3, 64, 32, 0.5)
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(brute.toSeq == lsh.toSeq && brute.nonEmpty)
  }
}
