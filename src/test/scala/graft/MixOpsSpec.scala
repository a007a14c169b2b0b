package graft

import org.apache.spark.sql.functions._

import graft.operators.MixOps

/** Token-budgeted mixing contracts (q130 pins the end-to-end oracle;
  * these pin the operator semantics the oracle can't isolate):
  * determinism under repartition, saturation (a weight asking for more
  * than a source holds keeps ALL of it — downsample-only), weight
  * monotonicity, and salt decorrelation.
  */
class MixOpsSpec extends SparkSpec {
  import spark.implicits._

  // three sources with equal doc counts and token mass: 60 docs of 10
  // tokens each per source; doc text varies by id so hashes spread
  private lazy val docs = (0 until 180).map { i =>
    (i.toLong, s"src${i % 3}", (0 until 10).map(j => s"w${i}_$j").mkString(" "))
  }.toDF("doc_id", "source", "text")

  private val w = substring(col("source"), 4, 10).cast("int") + 1 // src0→1, src1→2, src2→3

  test("the mix is deterministic under repartitioning and re-runs") {
    def keptIds(df: org.apache.spark.sql.DataFrame) =
      MixOps.mixByTokenBudget(df, "source", "text", "doc_id", w, budgetFrac = 0.3)
        .select("doc_id").as[Long].collect().toSet
    val a = keptIds(docs)
    assert(a.nonEmpty && a.size < 180, s"expected a strict sample, got ${a.size}")
    assert(keptIds(docs.repartition(7)) == a, "repartitioning changed the mix")
    assert(keptIds(docs) == a, "a re-run changed the mix")
  }

  test("weights shift kept token mass monotonically at equal source mass") {
    val kept = MixOps.mixByTokenBudget(docs, "source", "text", "doc_id", w, budgetFrac = 0.3)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // equal mass, weights 1 < 2 < 3 → expected kept 9/18/27 of 60 each
    // (hash-gating is exact in expectation; allow sampling spread)
    assert(kept.getOrElse("src2", 0L) > kept.getOrElse("src0", 0L),
      s"weight 3 must out-keep weight 1: $kept")
    val total = kept.values.sum.toDouble
    assert(total > 0.3 * 180 * 0.5 && total < 0.3 * 180 * 1.5,
      s"kept $total docs, want ~${0.3 * 180} for a 0.3 budget over uniform docs")
  }

  test("a saturated weight keeps its source whole (downsample-only, cut 0x10000)") {
    // src2 gets weight 100 of wsum 102 → its budget share far exceeds
    // its mass → rate clamps at 1.0 and EVERY src2 doc survives, while
    // the others are sampled hard
    val heavy = when(col("source") === "src2", lit(100)).otherwise(lit(1))
    val kept = MixOps.mixByTokenBudget(docs, "source", "text", "doc_id", heavy,
        budgetFrac = 0.5)
    assert(kept.filter(col("source") === "src2").count() == 60,
      "a saturated source must keep every doc")
    assert(kept.filter(col("source") === "src2").select("mix_cut").distinct()
      .head().getString(0) == "10000")
    assert(kept.filter(col("source") =!= "src2").count() < 60,
      "unsaturated sources must be downsampled")
  }

  test("the salt decorrelates mixes") {
    def ids(salt: String) =
      MixOps.mixByTokenBudget(docs, "source", "text", "doc_id", w,
        budgetFrac = 0.3, salt = salt).select("doc_id").as[Long].collect().toSet
    val (a, b) = (ids("graft-mix"), ids("graft-mix-b"))
    assert(a != b, "different salts must gate different rows")
    assert(math.abs(a.size - b.size) < 40, "both salts target the same budget")
  }
}
