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
}
