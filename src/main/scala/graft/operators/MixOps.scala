package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-budgeted corpus mixing: the standard pretraining-data recipe
  * step ("0.6 web + 0.3 code + 0.1 books of an N-token budget"),
  * expressed as a deterministic per-source downsample.
  *
  * Mechanics: one map-side-combinable aggregate derives each source's
  * token mass (sources are FEW by contract — the result is
  * driver/broadcast-small even over a 100 TB corpus); each source gets
  * keep-rate `min(1, budget · weightShare / sourceTokens)`, quantized
  * to a 16-bit cut; a row survives when the first 4 hex chars of
  * `sha256("<salt>:" + id)` sort below the cut (both sides left-padded
  * to 5 chars so a saturated rate — cut 0x10000 — keeps everything).
  * Hash-gating instead of rand() is the q62 convention: the mix is
  * identical under task retries, partitioning changes and re-runs, and
  * any engine reproduces it bit-for-bit, so the DuckDB oracle re-derives
  * the entire mix including the rates (q130). The salt decorrelates the
  * mix from every other hash use of the id.
  *
  * Plan shape: aggregate pass + a scan-side filter behind a broadcast
  * join of the #sources-row cut table — no corpus-wide shuffle.
  * Downsampling only (a weight asking for MORE than a source holds
  * saturates at keeping all of it — upsampling/repetition is an epochs
  * decision, not a sampling one).
  */
object MixOps {

  /** The gated mix: `docs` filtered to the budgeted sample, with the
    * per-source `mix_cut` (5-char hex) attached for auditability.
    *
    * @param weightExpr relative weight per source — must be a pure
    *                   function of `sourceCol` (it is aggregated per
    *                   source); weights are normalized over the
    *                   sources actually present. Fractional weights
    *                   ("0.6 web + 0.3 code + 0.1 books") are
    *                   first-class: the weight is aggregated as a
    *                   double. A weight of exactly 0 drops its source;
    *                   negative or all-zero weights are refused.
    * @param budgetFrac global token budget as a fraction of the
    *                   corpus's total tokens
    */
  def mixByTokenBudget(docs: DataFrame, sourceCol: String, textCol: String,
                       idCol: String, weightExpr: Column, budgetFrac: Double,
                       salt: String = "graft-mix"): DataFrame = {
    require(budgetFrac > 0, "budgetFrac must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = size(split(col(textCol), " ")).cast("long")
    // weight aggregated as DOUBLE: fractional recipes must not truncate
    // to 0 (a long cast turned '0.6 web' into an empty mix). For the
    // integral weights the q130 oracle uses, double aggregation equals
    // the oracle's CAST(w AS DOUBLE) bit-for-bit.
    val per = docs.groupBy(col(sourceCol))
      .agg(sum(toks).as("__toks"), max(weightExpr.cast("double")).as("__w"))
      .collect()
    require(per.forall(r => !r.isNullAt(2) && r.getDouble(2) >= 0),
      "every source weight must be a non-negative number")
    val tot = per.map(_.getLong(1)).sum.toDouble
    val wsum = per.map(_.getDouble(2)).sum
    require(wsum > 0, "at least one source weight must be positive")
    // float tree mirrored verbatim by the q130 oracle SQL — any
    // reordering here must be reordered there
    val cuts = per.map { r =>
      val rate = math.min(1.0,
        (tot * budgetFrac) * (r.getDouble(2) / wsum) / r.getLong(1).toDouble)
      (r.getString(0), f"${math.floor(rate * 65536.0).toLong}%05x")
    }.toSeq.toDF(sourceCol, "mix_cut")
    docs.join(broadcast(cuts), sourceCol)
      .filter(lpad(substring(
          sha2(concat(lit(s"$salt:"), col(idCol).cast("string")), 256), 1, 4),
        5, "0") < col("mix_cut"))
  }
}
