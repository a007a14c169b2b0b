package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Sliding-window chunking: boundary semantics pinned by hand, and the
  * plan pinned exchange-free (a chunker that shuffles turns the
  * cheapest pass of a 100 TB pipeline into its most expensive).
  */
class ChunkOpsSpec extends SparkSpec {
  import spark.implicits._

  private def chunks(text: String, window: Int, overlap: Int): Seq[(Long, Long, String)] =
    TextOps.chunkWindows(Seq((1L, text)).toDF("doc_id", "text"),
        "text", "doc_id", window, overlap)
      .orderBy("chunk_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3))).toSeq

  test("boundaries: coverage, overlap, short tails, one-chunk docs, blank filter") {
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    // window 4 / overlap 1 → step 3 → ceil((10-1)/3) = 3 chunks
    assert(chunks(ten, 4, 1) == Seq(
      (0L, 4L, "w1 w2 w3 w4"),
      (1L, 4L, "w4 w5 w6 w7"),
      (2L, 4L, "w7 w8 w9 w10")))
    // window 4 / overlap 0 → step 4 → 3 chunks, short tail kept
    assert(chunks(ten, 4, 0) == Seq(
      (0L, 4L, "w1 w2 w3 w4"),
      (1L, 4L, "w5 w6 w7 w8"),
      (2L, 2L, "w9 w10")))
    // doc shorter than the window → exactly one chunk
    assert(chunks("a b", 4, 1) == Seq((0L, 2L, "a b")))
    // doc with n <= overlap still yields its one chunk
    assert(chunks("lone", 4, 3) == Seq((0L, 1L, "lone")))
    // normalization: case folds, whitespace collapses
    assert(chunks("  A \t B\nC  ", 2, 0) == Seq((0L, 2L, "a b"), (1L, 1L, "c")))
    // blank docs are dropped, not emitted as empty chunks
    assert(TextOps.chunkWindows(Seq((1L, "   "), (2L, "ok then"))
        .toDF("doc_id", "text"), "text", "doc_id", 4, 1).count() == 1)
    // guards
    intercept[IllegalArgumentException](chunks("x", 4, 4))
    intercept[IllegalArgumentException](chunks("x", 0, 0))
  }

  test("laws over a (n, window, overlap) grid: coverage, exact overlap sharing, tail bounds") {
    // 60 parameter combinations in one driver loop — the law set a
    // property test would sample, checked exhaustively on a small grid
    for {
      n <- Seq(1, 2, 7, 8, 9, 31, 53, 100)
      (w, o) <- Seq((8, 3), (8, 0), (4, 1), (5, 4), (32, 8))
      if n > 0
    } {
      val doc = (1 to n).map(i => s"t$i").mkString(" ")
      val cs = chunks(doc, w, o).map(_._3.split(" ").toSeq)
      val step = w - o
      val expect = math.max(1, math.ceil((n - o).toDouble / step).toInt)
      assert(cs.size == expect, s"n=$n w=$w o=$o: ${cs.size} chunks, expected $expect")
      assert(cs.flatten.distinct.size == n, s"n=$n w=$w o=$o: a token went uncovered")
      cs.sliding(2).foreach {
        case Seq(a, b) => assert(a.takeRight(o) == b.take(o),
          s"n=$n w=$w o=$o: overlap broke between ${a.last} and ${b.head}")
        case _ => ()
      }
      assert(cs.init.forall(_.size == w), s"n=$n w=$w o=$o: a non-tail chunk ran short")
      assert(cs.last.size <= w && cs.last.nonEmpty)
      // chunk i starts at token i*step + 1 (1-based): positional law
      cs.zipWithIndex.foreach { case (c, i) =>
        assert(c.head == s"t${i * step + 1}", s"n=$n w=$w o=$o chunk $i starts at ${c.head}")
      }
    }
  }

  test("the chunker is a map-only pass: zero exchanges in the executed plan") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val df = TextOps.chunkWindows(docs, "text", "doc_id", 32, 8)
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"chunking must not shuffle:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("embedStub: hand-computed values, determinism, exchange-free plan") {
    // dim i samples char (i*31 + 7) mod len, scaled (ascii/255 - 0.5):
    // "ab" (len 2): i=0 → pos 7%2=1 → 'b'; i=1 → 38%2=0 → 'a'
    val out = Seq((1L, "ab")).toDF("id", "t")
      .select(TextOps.embedStub(col("t"), 4).as("e"))
      .head().getSeq[Double](0)
    assert(out == Seq('b'.toInt / 255.0 - 0.5, 'a'.toInt / 255.0 - 0.5,
      'b'.toInt / 255.0 - 0.5, 'a'.toInt / 255.0 - 0.5))
    // ASCII input stays in [-0.5, 0.5) (code points > 255 land above,
    // deterministically on both engines — see the scaladoc)
    assert(out.forall(v => v >= -0.5 && v < 0.5))
    // a pure per-row projection: zero exchanges end to end
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val df = TextOps.chunkWindows(docs, "text", "doc_id", 32, 8)
      .select(TextOps.embedStub(col("chunk_text"), 64).as("e"))
    df.write.format("noop").mode("overwrite").save()
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "the stub encoder must not shuffle")
  }
}
