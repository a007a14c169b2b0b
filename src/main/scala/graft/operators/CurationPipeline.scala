package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation: the composition a 100 TB
  * pipeline actually runs, built from the individual operators —
  *
  *  1. repetition filter (drop docs whose duplicate-word fraction
  *     exceeds a threshold, Gopher-style),
  *  2. exact dedup (keep the smallest id per normalized text),
  *  3. near-dup removal (drop the larger id of every 3-gram Jaccard
  *     pair ≥ threshold; candidates via MinHash+LSH, exact verify),
  *  4. benchmark decontamination (drop the eval docs themselves and
  *     every train doc sharing a 5-gram with one).
  *
  * Each stage is one distributed pass over the survivors of the
  * previous stage; at corpus scale the intermediate survivor sets
  * would be persisted as parquet between stages (they are lazily
  * recomputed here, which is fine for the verify scale and keeps the
  * composition a single declarative plan).
  */
object CurationPipeline {

  /** Survivors of the full chain, carrying (doc_id, lang, _nt norm
    * text, _ws words). `maxDupTenths` = allowed duplicate-word
    * fraction in tenths (7 → 70%), compared in exact integer
    * arithmetic.
    *
    * Stages 1-3 run on the TRAIN split only; decontamination compares
    * against the full ORIGINAL eval set — an eval doc must contaminate
    * even when dedup or the repetition filter would have dropped it as
    * a train doc.
    */
  def curate(docs: DataFrame, textCol: String, idCol: String, langCol: String,
             evalPred: Column, maxDupTenths: Int = 7,
             ngramN: Int = 3, jaccardThreshold: Double = 0.5,
             contamN: Int = 5): DataFrame = {
    // one materialized tokenization feeds stage 1 (lambda-CSE: see
    // DedupOps.shinglesOfWords)
    val base = docs.select(
        col(idCol).cast("long").as("doc_id"),
        col(langCol).as("lang"),
        evalPred.as("_is_eval"),
        DedupOps.normText(col(textCol)).as("_nt"))
      .withColumn("_ws", split(col("_nt"), " "))
    val train = base.filter(!col("_is_eval"))

    // 1. repetition filter
    val keep1 = train.filter(size(col("_ws")) >= 2 &&
      (size(col("_ws")) - size(array_distinct(col("_ws")))) * 10 <=
        size(col("_ws")) * maxDupTenths)

    // 2. exact dedup: min doc_id per normalized text (window, one
    // shuffle on the text hash). Persisted: it feeds the near-dup
    // shingle table AND the anti-join base (at corpus scale each stage
    // writes parquet instead).
    val keep2 = keep1
      .withColumn("_rn", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(sha2(col("_nt"), 256)).orderBy(col("doc_id").asc)))
      .filter(col("_rn") === 1).drop("_rn")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 3. near-dup removal: LSH candidates + exact verify (same engine
    // as q28; _nt is already normalized so re-normalization is a
    // no-op), drop the larger id of each pair
    val dropped = DedupOps.minhashNearDupPairs(keep2, "_nt", "doc_id",
        n = ngramN, threshold = jaccardThreshold)
      .select(col("doc_b").as("doc_id")).distinct()
    val keep3 = keep2.join(dropped, Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 4. decontamination: survivors vs the full original eval set
    // (union keeps contaminationReport's single-input shape; the eval
    // side broadcasts)
    val contaminated = DedupOps.contaminationReport(
        keep3.select("doc_id", "_nt").unionByName(
          base.filter(col("_is_eval")).select("doc_id", "_nt")),
        "_nt", "doc_id", evalPred, contamN)
      .select(col("train_doc").as("doc_id"))
    keep3.join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** Per-language corpus stats over the curated survivors. */
  def statsByLang(curated: DataFrame): DataFrame =
    curated.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("_ws")).cast("long")).as("total_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("lang")
}
