package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.operators.SplitOps

/** Leakage-safe splitting: cluster co-location by construction,
  * singleton fallback, exact hash-gate replay, determinism.
  */
class SplitOpsSpec extends SparkSpec {
  import spark.implicits._

  // pair graph: {1,2,3} chain (1-2, 2-3; 1-3 NOT a pair — transitivity
  // must come from the components), {10,11}, singletons 20, 21
  private lazy val docs = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L).toDF("doc_id")
  private lazy val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")

  private def gate(component: Long): String = {
    val d = MessageDigest.getInstance("SHA-256")
      .digest(("graft-split:" + component).getBytes("UTF-8"))
    f"${d(0) & 0xff}%02x"
  }
  private def expectedSplit(component: Long): String = {
    val g = gate(component)
    if (g < "1a") "test" else if (g < "34") "val" else "train"
  }

  private lazy val result =
    SplitOps.leakageSafeSplit(docs, "doc_id", pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

  test("components co-locate (transitively) and singletons fall back to their own id") {
    assert(result.keySet == Set(1L, 2L, 3L, 10L, 11L, 20L, 21L))
    assert(Set(1L, 2L, 3L).map(result(_)) == Set((1L, expectedSplit(1L))),
      "the 1-2-3 chain shares component 1 and ONE split")
    assert(Set(10L, 11L).map(result(_)) == Set((10L, expectedSplit(10L))))
    assert(result(20L) == (20L, expectedSplit(20L)))
    assert(result(21L) == (21L, expectedSplit(21L)))
  }

  test("no pair ever straddles a split boundary (the leakage property)") {
    // a denser random-ish graph: 40 docs, edges i -> i+step clusters
    val docs2 = (0L until 40L).toDF("doc_id")
    val pairs2 = (0 until 36 by 4).flatMap(i =>
      Seq((i.toLong, i + 1L), (i + 1L, i + 2L), (i + 2L, i + 3L))).toDF("doc_a", "doc_b")
    val split2 = SplitOps.leakageSafeSplit(docs2, "doc_id", pairs2, "doc_a", "doc_b")
    val byDoc = split2.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    pairs2.collect().foreach { r =>
      assert(byDoc(r.getLong(0)) == byDoc(r.getLong(1)),
        s"pair (${r.getLong(0)}, ${r.getLong(1)}) straddles splits")
    }
    // all cut labels exist somewhere across many singleton components —
    // the gate really is 3-way (0x1a/0x34 boundaries, not degenerate)
    val lots = (0L until 300L).toDF("doc_id")
    val none = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val splits = SplitOps.leakageSafeSplit(lots, "doc_id", none, "doc_a", "doc_b")
      .select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits == Set("train", "val", "test"))
  }

  test("keep-best retention: the longest member wins, min-id breaks ties") {
    val scored = Seq((1L, 50L), (2L, 90L), (3L, 90L), (10L, 5L), (11L, 5L),
      (20L, 7L), (21L, 0L)).toDF("doc_id", "n_chars")
    val r = SplitOps.nearDupKeepBest(scored, "doc_id", col("n_chars"),
        pairs, "doc_a", "doc_b")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(3), x.getBoolean(4))).toMap
    // cluster {1,2,3}: scores 50/90/90 → keeper 2 (tie with 3 → min id)
    assert(r(1L) == (1L, 2L, false))
    assert(r(2L) == (1L, 2L, true))
    assert(r(3L) == (1L, 2L, false))
    // cluster {10,11}: tie at 5 → keeper 10
    assert(r(10L) == (10L, 10L, true))
    assert(r(11L) == (10L, 10L, false))
    // singletons always keep themselves
    assert(r(20L) == (20L, 20L, true))
    assert(r(21L) == (21L, 21L, true))
  }

  test("non-lowercase-hex cut points are rejected, not silently skewed") {
    // the gate compares lexicographically against lowercase-hex sha256
    // prefixes: "A0" sorts below every [0-9a-f]{2} gate value, so an
    // uppercase cut would silently produce ~0% test instead of failing
    Seq(("A0", "b0"), ("1a", "2G"), ("1", "34"), ("xyz", "34")).foreach {
      case (t, v) =>
        val e = intercept[IllegalArgumentException] {
          SplitOps.leakageSafeSplit(docs, "doc_id", pairs, "doc_a", "doc_b", t, v)
        }
        assert(e.getMessage.contains("lowercase-hex"), s"($t,$v): ${e.getMessage}")
    }
  }

  test("FromComponents overloads reproduce the pair-graph forms exactly") {
    import graft.operators.GraphOps
    val comp = GraphOps.connectedComponents(pairs, "doc_a", "doc_b")
    val viaComp = SplitOps.leakageSafeSplitFromComponents(docs, "doc_id", comp)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(viaComp == result, "split: prebuilt components diverge from the pair form")

    val scored = Seq((1L, 50L), (2L, 90L), (3L, 90L), (10L, 5L), (11L, 5L),
      (20L, 7L), (21L, 0L)).toDF("doc_id", "n_chars")
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3), x.getBoolean(4)))
      .toMap
    val viaPairs = keyed(SplitOps.nearDupKeepBest(scored, "doc_id", col("n_chars"),
      pairs, "doc_a", "doc_b"))
    val viaComp2 = keyed(SplitOps.nearDupKeepBestFromComponents(scored, "doc_id",
      col("n_chars"), comp))
    assert(viaComp2 == viaPairs, "keep-best: prebuilt components diverge from the pair form")
  }

  test("deterministic under repartitioning") {
    val again = SplitOps.leakageSafeSplit(docs.repartition(5), "doc_id",
        pairs.repartition(3), "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(again == result)
  }
}
