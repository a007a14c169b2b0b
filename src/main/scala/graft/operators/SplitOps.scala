package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cluster-level dataset policies: operations whose unit is the
  * near-dup CONNECTED COMPONENT rather than the document — leakage-safe
  * train/val/test splitting and keep-best retention.
  *
  * Leakage-safe splitting: train/val/test assignment that
  * respects the near-dup graph, so two near-duplicate documents can
  * never straddle a split boundary (the eval-contamination failure a
  * per-doc random split bakes in: the GPT-3 dedup postmortem and Lee
  * et al. 2022 both trace inflated eval numbers to exactly this).
  *
  * The unit of assignment is the CONNECTED COMPONENT of the near-dup
  * pair graph ([[GraphOps.connectedComponents]] — pointer-doubling,
  * O(log diameter) rounds), labeled by its minimum member id; docs in
  * no pair are their own singleton component. The split gates on the
  * engine-portable sha256-prefix of the COMPONENT id (the q62
  * convention, salt `graft-split:`): identical under task retries,
  * partitioning changes, re-runs, and any engine — and co-location is
  * by construction, not by post-hoc repair.
  *
  * Cut points are 2-hex-char prefixes: gate < testCut → test;
  * < valCut → val; else train (defaults ≈ 10% / 10% / 80%:
  * 0x1a/256 ≈ 10.2%, 0x34/256 ≈ 20.3% cumulative).
  *
  * Scale shape: the pair graph is near-dup-sized (tiny vs the corpus),
  * CC shuffles only the pair nodes, and the corpus-side work is one
  * left join on doc_id plus a narrow projection — the broadcast-sized
  * component table rides onto the corpus scan when the dup mass is
  * small, and AQE picks the join strategy either way.
  */
object SplitOps {

  /** One row per input doc: (doc_id, component, split). `pairs` must
    * carry two doc-id columns of the near-dup pair graph (aCol, bCol).
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      testCut: String = "1a", valCut: String = "34"): DataFrame = {
    val comp = GraphOps.connectedComponents(pairs, aCol, bCol)
    leakageSafeSplitFromComponents(docs, idCol, comp, testCut, valCut)
  }

  /** [[leakageSafeSplit]] over a PREBUILT component table (doc_id,
    * component) — the reuse seam for a curation pipeline that derives
    * the near-dup components once and feeds split, retention and mix
    * from the same frame instead of re-running MinHash + CC per
    * consumer (TrainDataE2E wires it this way). Docs absent from
    * `comp` are their own singleton component, exactly as the
    * pair-graph form treats unpaired docs.
    */
  def leakageSafeSplitFromComponents(docs: DataFrame, idCol: String,
      comp: DataFrame,
      testCut: String = "1a", valCut: String = "34"): DataFrame = {
    // the gate is a LEXICOGRAPHIC compare against lowercase-hex sha256
    // prefixes: a non-lowercase-hex cut ("A0", "2G") would not fail —
    // uppercase sorts below 'a', so it silently skews the fractions
    Seq("testCut" -> testCut, "valCut" -> valCut).foreach { case (n, c) =>
      require(c.matches("[0-9a-f]{2}"),
        s"$n ('$c') must be a 2-char lowercase-hex prefix")
    }
    require(testCut <= valCut,
      s"testCut ($testCut) must not exceed valCut ($valCut)")
    val labeled = docs.select(col(idCol).cast("long").as("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
    val gate = substring(
      sha2(concat(lit("graft-split:"), col("component").cast("string")), 256), 1, 2)
    labeled.withColumn("split",
      when(gate < lit(testCut), lit("test"))
        .when(gate < lit(valCut), lit("val"))
        .otherwise(lit("train")))
  }

  /** Keep-BEST near-dup retention (the RefinedWeb/FineWeb policy:
    * clusters keep their highest-quality member — typically the
    * longest — not the arbitrary lowest id that a min-id dedup
    * implies). The unit is again the transitive near-dup component;
    * the keeper is argmax(score) with min-id tie-break, computed as a
    * COMBINABLE struct-max aggregate — (score, −doc_id) compares
    * lexicographically, so no per-component sort window exists to skew
    * on a giant cluster. `score` must be an exact integer column (the
    * cross-engine convention; q141 uses n_chars — "keep longest").
    *
    * Returns one row per doc: (doc_id, component, score, keeper, kept).
    */
  def nearDupKeepBest(docs: DataFrame, idCol: String, score: Column,
      pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val comp = GraphOps.connectedComponents(pairs, aCol, bCol)
    nearDupKeepBestFromComponents(docs, idCol, score, comp)
  }

  /** [[nearDupKeepBest]] over a PREBUILT component table (doc_id,
    * component) — the same reuse seam as
    * [[leakageSafeSplitFromComponents]]: one CC job feeds both the
    * split and the retention policy.
    */
  def nearDupKeepBestFromComponents(docs: DataFrame, idCol: String,
      score: Column, comp: DataFrame): DataFrame = {
    val labeled = docs.select(col(idCol).cast("long").as("doc_id"),
        score.cast("long").as("score"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"), col("score"),
        coalesce(col("component"), col("doc_id")).as("component"))
    val keepers = labeled.groupBy("component")
      .agg(max(struct(col("score"), (-col("doc_id")).as("nid"))).as("best"))
      .select(col("component"), (-col("best.nid")).as("keeper"))
    labeled.join(keepers, Seq("component"))
      .select(col("doc_id"), col("component"), col("score"), col("keeper"),
        (col("doc_id") === col("keeper")).as("kept"))
  }
}
