package graft

import org.apache.spark.sql.functions._

import graft.operators.CurationPipeline

/** Each planted defect is removed by exactly the stage built for it;
  * the clean docs survive the whole chain.
  */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  // eval set = ids divisible by 10
  private lazy val docs = Seq(
    (1L, "en", "the quick brown fox jumps over the lazy dog today"),
    (2L, "en", "spam spam spam spam spam spam spam ham"),          // repetitive (6/8 dups > 70%)
    (3L, "en", "The  Quick brown fox JUMPS over the lazy dog today"), // exact dup of 1 after norm
    (4L, "en", "the quick brown fox jumps over the lazy dog tonight"), // near-dup of 1 (Jaccard 8/10 of 3-grams… ≥ 0.5)
    (5L, "de", "ein ganz anderes dokument ohne irgendeine uberlappung hier"),
    (10L, "en", "pack my box with five dozen liquor jugs"),         // eval doc
    (6L, "en", "please pack my box with five dozen liquor jugs now") // contaminated by 10
  ).toDF("doc_id", "lang", "text")

  test("curate removes repetitive, duplicate, near-dup, eval, and contaminated docs") {
    val survivors = CurationPipeline.curate(docs, "text", "doc_id", "lang",
        col("doc_id") % 10 === 0)
      .select("doc_id").as[Long].collect().sorted
    // 2 repetitive; 3 exact-dup of 1; 4 near-dup of 1; 10 eval; 6 contaminated
    assert(survivors.toSeq == Seq(1L, 5L))
  }

  test("statsByLang aggregates the survivors") {
    val got = CurationPipeline.statsByLang(
        CurationPipeline.curate(docs, "text", "doc_id", "lang",
          col("doc_id") % 10 === 0))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(("de", 1L, 8L, 5L, 5L), ("en", 1L, 10L, 1L, 1L)))
  }
}
