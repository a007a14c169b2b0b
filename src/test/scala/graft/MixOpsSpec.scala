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

  test("fractional weights mix the canonical 0.6/0.3/0.1 recipe (no long-truncation)") {
    // the scaladoc's own example: weights that a long cast would turn
    // into 0/0/0 (wsum=0 → NaN rate → silently empty mix)
    val frac = when(col("source") === "src0", lit(0.6))
      .when(col("source") === "src1", lit(0.3)).otherwise(lit(0.1))
    val kept = MixOps.mixByTokenBudget(docs, "source", "text", "doc_id", frac,
        budgetFrac = 0.3)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(kept.values.sum > 0, "fractional weights must not yield an empty mix")
    assert(kept.getOrElse("src0", 0L) > kept.getOrElse("src2", 0L),
      s"weight 0.6 must out-keep weight 0.1 at equal source mass: $kept")
    // fractional and integral statements of the same ratios gate the
    // SAME rows — only the weight SHARES matter
    val scaled = when(col("source") === "src0", lit(6))
      .when(col("source") === "src1", lit(3)).otherwise(lit(1))
    val a = MixOps.mixByTokenBudget(docs, "source", "text", "doc_id", frac, 0.3)
      .select("doc_id").as[Long].collect().toSet
    val b = MixOps.mixByTokenBudget(docs, "source", "text", "doc_id", scaled, 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "0.6/0.3/0.1 and 6/3/1 must produce the same mix")
  }

  test("degenerate weights are refused loudly, zero drops only its source") {
    val neg = when(col("source") === "src0", lit(-1.0)).otherwise(lit(1.0))
    assertThrows[IllegalArgumentException] {
      MixOps.mixByTokenBudget(docs, "source", "text", "doc_id", neg, 0.3)
    }
    assertThrows[IllegalArgumentException] {
      MixOps.mixByTokenBudget(docs, "source", "text", "doc_id", lit(0.0), 0.3)
    }
    val oneZero = when(col("source") === "src0", lit(0.0)).otherwise(lit(1.0))
    val kept = MixOps.mixByTokenBudget(docs, "source", "text", "doc_id", oneZero, 0.3)
    assert(kept.filter(col("source") === "src0").count() == 0,
      "a zero-weight source contributes nothing")
    assert(kept.count() > 0, "the positive-weight sources still mix")
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
