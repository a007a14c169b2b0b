package graft

import org.apache.spark.sql.functions._

import graft.operators.PruneOps

/** Bloom-pruned semi-join must equal the plain semi-join exactly — the
  * sketch only prunes; false positives die in the exact join.
  */
class PruneOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bloomSemiJoin equals the plain left-semi join") {
    val big = (0L until 5000L).map(i => (i, s"row$i")).toDF("k", "payload")
    val keys = (0L until 500L).filter(_ % 3 == 0).map(i => (i * 7, "x")).toDF("key", "tag")
    // tiny fpp-heavy sketch to force false positives through the prune
    val pruned = PruneOps.bloomSemiJoin(big, keys, "k", "key",
      expectedItems = 50, fpp = 0.3)
    val plain = big.join(keys.select(col("key").as("k")).distinct(), Seq("k"), "left_semi")
    assert(pruned.orderBy("k").collect().toSeq == plain.orderBy("k").collect().toSeq)
    assert(pruned.count() > 0)
  }
}
