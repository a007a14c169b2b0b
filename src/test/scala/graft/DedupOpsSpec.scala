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
