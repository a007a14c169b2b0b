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
             contamN: Int = 5,
                 maxBucket: Int = DedupOps.DefaultMaxBucket): DataFrame =
    curateStages(docs, textCol, idCol, langCol, evalPred, maxDupTenths,
      ngramN, jaccardThreshold, contamN, maxBucket).last._2

  /** [[curate]] with its stage boundaries exposed (label → survivors so
    * far) — the profiling surface: timing each frame gives the
    * cumulative cost up to that stage.
    */
  def curateStages(docs: DataFrame, textCol: String, idCol: String, langCol: String,
                   evalPred: Column, maxDupTenths: Int = 7,
                   ngramN: Int = 3, jaccardThreshold: Double = 0.5,
                   contamN: Int = 5,
                 maxBucket: Int = DedupOps.DefaultMaxBucket): Seq[(String, DataFrame)] =
    curateStagesWithCaches(docs, textCol, idCol, langCol, evalPred,
      maxDupTenths, ngramN, jaccardThreshold, contamN, maxBucket)._1

  /** [[curateStages]] plus every frame the chain persisted (stage frames
    * AND the internal shingle table) so an owner can unpersist them all
    * after its final action — see [[curateToParquet]] — plus the chain's
    * monitoring reports (near-dup cap drops; lazy, evaluated only when a
    * sink writes them).
    */
  private def curateStagesWithCaches(docs: DataFrame, textCol: String, idCol: String,
                   langCol: String,
                   evalPred: Column, maxDupTenths: Int = 7,
                   ngramN: Int = 3, jaccardThreshold: Double = 0.5,
                   contamN: Int = 5,
                 maxBucket: Int = DedupOps.DefaultMaxBucket):
      (Seq[(String, DataFrame)], Seq[DataFrame], Seq[(String, DataFrame)]) = {
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

    // 2. exact dedup: min doc_id per normalized text (combinable
    // min-agg + semi-join — skew-proof on mass-duplicate corpora, see
    // DedupOps.keepMinIdPerText). Persisted: it feeds the near-dup
    // shingle table AND the anti-join base (at corpus scale each stage
    // writes parquet instead).
    val keep2 = DedupOps.keepMinIdPerText(keep1, "_nt", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 3. near-dup removal: LSH candidates + exact verify (same engine
    // as q28; _nt is already normalized so re-normalization is a
    // no-op), drop the larger id of each pair. The shingle table is
    // persisted HERE (not inside minhashNearDupPairs) so the chain owns
    // every cache it creates and can hand them to an unpersisting caller.
    val sh = DedupOps.shingleHashTable(keep2, "_nt", "doc_id", ngramN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dropped = DedupOps.minhashNearDupPairsFromShingles(sh,
        threshold = jaccardThreshold, cacheShingles = false, maxBucket = maxBucket)
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
    val result = keep3.join(contaminated, Seq("doc_id"), "left_anti")
    (Seq("1_repetition_gate" -> keep1, "2_exact_dedup" -> keep2,
      "3_near_dedup" -> keep3, "4_decontaminated" -> result),
      Seq(keep2, sh, keep3),
      // cap-drop observability ("no silent caps"): the LSH buckets the
      // near-dup stage's cap discarded, over the SAME persisted shingle
      // frame the candidates ran on
      Seq("near_dup_cap_drops" ->
        DedupOps.minhashOversizedBuckets(sh, maxBucket = maxBucket)))
  }

  /** [[curate]] in the corpus-scale shape: every stage materializes to
    * `outDir/<label>.parquet` (later stages reuse the in-session caches
    * while writing; the parquet gives restartability), then every cache
    * the chain created is unpersisted — a long-lived session can run
    * curation repeatedly without accumulating executor storage. Returns
    * the final survivors read back from parquet.
    */
  def curateToParquet(docs: DataFrame, textCol: String, idCol: String, langCol: String,
                      evalPred: Column, outDir: String, maxDupTenths: Int = 7,
                      ngramN: Int = 3, jaccardThreshold: Double = 0.5,
                      contamN: Int = 5,
                 maxBucket: Int = DedupOps.DefaultMaxBucket): DataFrame = {
    val (stages, caches, reports) = curateStagesWithCaches(docs, textCol, idCol, langCol,
      evalPred, maxDupTenths, ngramN, jaccardThreshold, contamN, maxBucket)
    stages.foreach { case (label, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$label.parquet")
    }
    // monitoring artifacts: what the caps dropped, recorded next to the
    // stage outputs so a production run never discards mass silently
    reports.foreach { case (label, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/reports/$label.parquet")
    }
    caches.foreach(_.unpersist())
    docs.sparkSession.read.parquet(s"$outDir/${stages.last._1}.parquet")
  }

  /** The FULL curation chain a web-scale training pipeline runs —
    * [[curate]]'s stages plus the scrubbing family, composed in the
    * order that keeps every stage's input well-defined:
    *
    *  1. Gopher quality gate (word count / word length / repetition /
    *     stopwords, integer arithmetic) on the train split,
    *  2. exact dedup (min id per normalized text) — BEFORE the span
    *     stage, deliberately: two full copies share every span, so
    *     span-level dedup run first would blank both instead of
    *     keeping one,
    *  3. line-level boilerplate removal (lineWords-word lines appearing
    *     in ≥ lineMinDocs surviving docs drop from every doc; emptied
    *     docs drop),
    *  4. span-level substring dedup (spanWords-word spans occurring
    *     ≥ spanMinCount times across survivors; emptied docs drop),
    *  5. near-dup removal (MinHash+LSH + exact Jaccard verify on the
    *     cleaned text, drop the larger id),
    *  6. decontamination: survivors sharing a contamN-gram with the
    *     ORIGINAL eval texts drop (eval set is never scrubbed — a
    *     contaminated doc must not escape because scrubbing reshaped
    *     its words).
    *
    * Texts are re-derived between scrubbing stages, so later stages see
    * what earlier stages produced — exactly what the oracle replays.
    */
  def curateFull(docs: DataFrame, textCol: String, idCol: String, langCol: String,
                 evalPred: Column, minWords: Int = 15,
                 lineWords: Int = 4, lineMinDocs: Int = 3,
                 spanWords: Int = 10, spanMinCount: Int = 2,
                 ngramN: Int = 3, jaccardThreshold: Double = 0.5,
                 contamN: Int = 5,
                 maxBucket: Int = DedupOps.DefaultMaxBucket): DataFrame =
    curateFullStages(docs, textCol, idCol, langCol, evalPred, minWords,
      lineWords, lineMinDocs, spanWords, spanMinCount, ngramN,
      jaccardThreshold, contamN, maxBucket).last._2

  /** [[curateFull]] with stage boundaries exposed for profiling. */
  def curateFullStages(docs: DataFrame, textCol: String, idCol: String, langCol: String,
                 evalPred: Column, minWords: Int = 15,
                 lineWords: Int = 4, lineMinDocs: Int = 3,
                 spanWords: Int = 10, spanMinCount: Int = 2,
                 ngramN: Int = 3, jaccardThreshold: Double = 0.5,
                 contamN: Int = 5,
                 maxBucket: Int = DedupOps.DefaultMaxBucket): Seq[(String, DataFrame)] =
    curateFullStagesWithCaches(docs, textCol, idCol, langCol, evalPred, minWords,
      lineWords, lineMinDocs, spanWords, spanMinCount, ngramN,
      jaccardThreshold, contamN, maxBucket)._1

  private def curateFullStagesWithCaches(docs: DataFrame, textCol: String, idCol: String,
                 langCol: String,
                 evalPred: Column, minWords: Int = 15,
                 lineWords: Int = 4, lineMinDocs: Int = 3,
                 spanWords: Int = 10, spanMinCount: Int = 2,
                 ngramN: Int = 3, jaccardThreshold: Double = 0.5,
                 contamN: Int = 5,
                 maxBucket: Int = DedupOps.DefaultMaxBucket):
      (Seq[(String, DataFrame)], Seq[DataFrame], Seq[(String, DataFrame)]) = {
    val base = docs.select(
        col(idCol).cast("long").as("doc_id"),
        col(langCol).as("lang"),
        evalPred.as("_is_eval"),
        DedupOps.normText(col(textCol)).as("_nt"))
      .withColumn("_ws", split(col("_nt"), " "))
    val train = base.filter(!col("_is_eval"))

    // 1. quality gate
    val keep1 = train
      .filter(size(TextOps.gopherFailReasons(col("_ws"), minWords = minWords)) === 0)

    // 2. exact dedup on the normalized text (before span dedup: full
    // copies share every span and would annihilate each other there).
    // Combinable min-agg + semi-join — skew-proof, see keepMinIdPerText.
    val keep2 = DedupOps.keepMinIdPerText(keep1, "_nt", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 3. line-level boilerplate removal over the deduped corpus
    val chunks = transform(
      sequence(lit(0), floor((size(col("_ws")) - 1) / lineWords).cast("int")),
      i => array_join(slice(col("_ws"), i * lineWords + 1, lit(lineWords)), " "))
    val lined = keep2.select(col("doc_id"), array_join(chunks, "\n").as("_lined"))
    val keep3 = ScrubOps.lineFrequencyFilter(lined, "_lined", "doc_id", lineMinDocs)
      .filter(col("text_clean") =!= "")
      .select(col("doc_id"),
        regexp_replace(col("text_clean"), "\n", " ").as("_t"))

    // 4. span-level substring dedup over the line-cleaned corpus;
    // emitWordHashes hands the surviving words' hashes straight to the
    // near-dup stage (no re-tokenize / re-hash of the cleaned text)
    val (spanned, spanCaches) = ScrubOps.spanDedupWithCaches(keep3, "_t", "doc_id",
      spanWords, spanMinCount, emitWordHashes = true)
    val keep4 = spanned
      .filter(col("text_clean") =!= "")
      .select(col("doc_id"), col("text_clean").as("_t"), col("wh_clean"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 5. near-dup removal, shingling the span stage's word-hash arrays;
    // the shingle frame persists here (chain-owned, see curateStages)
    val shTbl = keep4.select(col("doc_id"),
        DedupOps.shingleHashesOfWordHashes(col("wh_clean"), ngramN).as("sg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dropped = DedupOps.minhashNearDupPairsFromShingles(shTbl,
        threshold = jaccardThreshold, cacheShingles = false, maxBucket = maxBucket)
      .select(col("doc_b").as("doc_id")).distinct()
    // keep5 carries wh_clean forward: the decontamination stage shingles
    // the SAME surviving-word hashes (split(_t) words == the surviving
    // words, FNV'd == wh_clean) instead of re-tokenizing every survivor
    val keep5 = keep4.join(dropped, Seq("doc_id"), "left_anti")
      .select("doc_id", "_t", "wh_clean")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 6. decontamination vs the ORIGINAL eval texts — eval side hashed
    // with the same FNV kernel so the shingle families match
    val evalWh = ScrubOps.fnvWordHashTable(
        base.filter(col("_is_eval")).select("doc_id", "_nt"), "_nt", "doc_id")
      .select(col("doc_id"), lit(true).as("_is_eval"), col("wh").as("_wh"))
    val trainWh = keep5.select(col("doc_id"), lit(false).as("_is_eval"),
      col("wh_clean").as("_wh"))
    val contaminated = DedupOps.contaminationReportFromWordHashes(
        trainWh.unionByName(evalWh), contamN)
      .select(col("train_doc").as("doc_id"))
    val result = keep5.join(contaminated, Seq("doc_id"), "left_anti")
      .select("doc_id", "_t")
      .join(base.select("doc_id", "lang"), Seq("doc_id"))
      .withColumn("_ws", split(col("_t"), " "))
    (Seq("1_quality_gate" -> keep1, "2_exact_dedup" -> keep2,
      "3_line_scrub" -> keep3, "4_span_dedup" -> keep4,
      "5_near_dedup" -> keep5, "6_decontaminated" -> result),
      Seq(keep2) ++ spanCaches ++ Seq(keep4, shTbl, keep5),
      Seq("near_dup_cap_drops" ->
        DedupOps.minhashOversizedBuckets(shTbl, maxBucket = maxBucket)))
  }

  /** [[curateFull]] in the corpus-scale shape (see [[curateToParquet]]):
    * per-stage parquet materialization, then every chain-created cache
    * unpersists. Returns the final survivors read back from parquet.
    */
  def curateFullToParquet(docs: DataFrame, textCol: String, idCol: String, langCol: String,
                 evalPred: Column, outDir: String, minWords: Int = 15,
                 lineWords: Int = 4, lineMinDocs: Int = 3,
                 spanWords: Int = 10, spanMinCount: Int = 2,
                 ngramN: Int = 3, jaccardThreshold: Double = 0.5,
                 contamN: Int = 5,
                 maxBucket: Int = DedupOps.DefaultMaxBucket): DataFrame = {
    val (stages, caches, reports) = curateFullStagesWithCaches(docs, textCol, idCol, langCol,
      evalPred, minWords, lineWords, lineMinDocs, spanWords, spanMinCount,
      ngramN, jaccardThreshold, contamN, maxBucket)
    stages.foreach { case (label, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$label.parquet")
    }
    reports.foreach { case (label, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/reports/$label.parquet")
    }
    caches.foreach(_.unpersist())
    docs.sparkSession.read.parquet(s"$outDir/${stages.last._1}.parquet")
  }

  /** Per-language corpus stats over the curated survivors. The
    * repartition barrier before the orderBy is the q48 trick: the range
    * sampler's separate job then reuses this exchange's map output
    * instead of re-running the whole chain's narrow segments.
    */
  def statsByLang(curated: DataFrame): DataFrame =
    curated.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("_ws")).cast("long")).as("total_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .repartition(col("lang"))
      .orderBy("lang")
}
