package graft

import org.apache.spark.sql.functions._

import graft.operators.ScrubOps

/** Dirty-window decontamination scrub: exact window extents, edge
  * clamping, clean-doc passthrough, full-coverage empty survivor,
  * short-doc immunity, eval exclusion.
  */
class DecontaminateScrubSpec extends SparkSpec {
  import spark.implicits._

  private val phrase = "alpha beta gamma delta epsilon" // the dirty 5-gram
  private lazy val docs = Seq(
    // eval doc (id % 10 == 0) quoting the phrase with context
    (10L, s"foo1 $phrase foo2"),
    // train doc: 20 unique words, the phrase at start=20, 20 more
    (1L, ((0 until 20).map(i => s"w$i") ++ phrase.split(" ") ++
      (0 until 20).map(i => s"v$i")).mkString(" ")),
    // clean train doc
    (2L, (0 until 30).map(i => s"c$i").mkString(" ")),
    // train doc that IS the phrase — fully covered, survives empty
    (3L, phrase),
    // sub-n-gram doc: no 5-word span exists, immune by construction
    (4L, "tiny doc")
  ).toDF("doc_id", "text")

  private lazy val result =
    ScrubOps.decontaminateScrub(docs, "text", "doc_id", col("doc_id") % 10 === 0,
        n = 5, window = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap

  test("the dirty occurrence excises exactly [start-window, start+n-1+window]") {
    assert(result.keySet == Set(1L, 2L, 3L, 4L), "train docs only")
    val (nWords, nCovered, clean) = result(1L)
    assert(nWords == 45L)
    // start=20 -> cover positions 10..34 inclusive = 25 words
    assert(nCovered == 25L)
    // covered = positions 10..34: w10..w19, the phrase, v0..v9;
    // survivors = w0..w9 (positions 0..9) + v10..v19 (positions 35..44)
    val expected = ((0 until 10).map(i => s"w$i") ++ (10 until 20).map(i => s"v$i")).mkString(" ")
    assert(clean == expected, "survivors are w0..w9 then v10..v19 in order")
  }

  test("clean docs pass through untouched; full coverage survives as empty text") {
    assert(result(2L) == (30L, 0L, (0 until 30).map(i => s"c$i").mkString(" ")))
    assert(result(3L) == (5L, 5L, ""), "window clamps to the doc bounds")
    assert(result(4L) == (2L, 0L, "tiny doc"), "sub-n docs have no spans to match")
  }

  test("deterministic under repartitioning") {
    val again = ScrubOps.decontaminateScrub(docs.repartition(4), "text", "doc_id",
        col("doc_id") % 10 === 0, n = 5, window = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(again == result)
  }
}
