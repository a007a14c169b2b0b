package graft

import graft.operators.GraphOps

/** Min-label propagation must collapse transitive chains, not just
  * direct pairs.
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("connected components merge chains and keep islands apart") {
    // chain 5-3-8-2 (one component, min 2), pair 10-7, isolated pair 20-21
    val pairs = Seq((3L, 5L), (3L, 8L), (8L, 2L), (7L, 10L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val got = GraphOps.connectedComponents(pairs, "doc_a", "doc_b")
      .orderBy("doc_id")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((2L, 2L), (3L, 2L), (5L, 2L), (7L, 7L), (8L, 2L),
      (10L, 7L), (20L, 20L), (21L, 20L)))
  }

  test("a single pair yields one two-node component") {
    val got = GraphOps.connectedComponents(
        Seq((9L, 4L)).toDF("doc_a", "doc_b"), "doc_a", "doc_b")
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((4L, 4L), (9L, 4L)))
  }

  test("deep chain converges in O(log d) rounds, not O(d)") {
    // path 0-1-2-...-199: diameter 199. Plain neighbor-min needs ~199
    // rounds; pointer doubling reaches the fixpoint in ~log2(199)+1
    // plus one no-change round to detect convergence. The bound also
    // exercises the periodic localCheckpoint (default every 5 rounds).
    val pairs = (0L until 199L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (labels, rounds) =
      GraphOps.connectedComponentsWithRounds(pairs, "doc_a", "doc_b")
    val got = labels.orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got == (0L to 199L).map(i => (i, 0L)))
    assert(rounds <= 12, s"expected <=12 propagation rounds on a 200-node path, got $rounds")
  }

  test("two deep chains stay separate components") {
    val a = (0L until 40L).map(i => (i, i + 1))
    val b = (100L until 140L).map(i => (i, i + 1))
    val got = GraphOps.connectedComponents((a ++ b).toDF("doc_a", "doc_b"), "doc_a", "doc_b")
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got == (0L to 40L).map(i => (i, 0L)) ++ (100L to 140L).map(i => (i, 100L)))
  }
}
