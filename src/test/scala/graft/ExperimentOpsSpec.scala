package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ExperimentOps
import graft.operators.ExperimentOps.PromptVariant

/** A10/L4 experiment fan-out: variant×candidate cross, deterministic stub
  * scorer, weekly ranking, and the reference's summary columns
  * (ridiculous_sentences_experiments.py build_summary :614-631).
  */
class ExperimentOpsSpec extends SparkSpec {
  import spark.implicits._

  private val speeches = Seq(
    // week 202601: two speakers, multi-sentence speeches
    ("202601", "2026-01-05", "Alice Murphy", "The budget is late. We must act now! Nonsense, total nonsense.", "Finance", "s1"),
    ("202601", "2026-01-06", "Brian Byrne", "I disagree entirely. The numbers say otherwise.", "Finance", "s2"),
    // week 202602: one speaker
    ("202602", "2026-01-12", "Alice Murphy", "Roads need repair. Bridges too.", "Transport", "s3"))
    .toDF("week_id", "debate_date", "speaker_name", "speech_text", "section_name", "speech_id")

  private val variants = Seq(
    PromptVariant("v1", "absurdist", "sentence_score"),
    PromptVariant("v2", "deadpan", "sentence_score"))

  // deterministic stub: score = word count + variant bonus (v2 +10)
  private def stubScorer(cands: DataFrame): DataFrame =
    cands.withColumn("score",
      (col("word_count") + when(col("variant_id") === "v2", 10).otherwise(0)).cast("int"))

  test("filterVariants drops malformed and honors approach/id filters") {
    val vs = variants :+ PromptVariant("", "x", "sentence_score") :+
      PromptVariant("v3", "y", "") :+ PromptVariant("v4", "z", "extract_then_score")
    assert(ExperimentOps.filterVariants(vs).map(_.variantId) == Seq("v1", "v2", "v4"))
    assert(ExperimentOps.filterVariants(vs, approachFilter = Some("sentence_score"))
      .map(_.variantId) == Seq("v1", "v2"))
    assert(ExperimentOps.filterVariants(vs, variantFilter = Set("v2", "v4"))
      .map(_.variantId) == Seq("v2", "v4"))
  }

  test("fan-out: every variant sees every deduped candidate, variant-scoped ids") {
    val cands = ExperimentOps.fanOutCandidates(speeches, variants)
    val perVariant = cands.groupBy("variant_id").count().orderBy("variant_id")
      .as[(String, Long)].collect().toSeq
    // 7 sentences across the corpus (3 + 2 + 2), none deduped away
    assert(perVariant == Seq(("v1", 7L), ("v2", 7L)))
    // candidate ids are variant-scoped: same quote, different id per variant
    val idsPerQuote = cands.groupBy("quote")
      .agg(countDistinct("candidate_id").as("n")).select("n")
      .as[Long].collect().toSet
    assert(idsPerQuote == Set(2L))
    // reference candidate_id recomputed: sha256(variant||week||speaker||quote)[:24]
    val one = cands.filter(col("variant_id") === "v1" && col("quote") === "Bridges too.")
      .select("candidate_id", "week_id", "speaker_name").as[(String, String, String)].head()
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val raw = Seq("v1", one._2, one._3, "Bridges too.").mkString("||")
    val exp = md.digest(raw.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(24)
    assert(one._1 == exp)
  }

  test("weekly ranking and summary match the reference semantics") {
    val (scored, top, summary) = ExperimentOps.runExperiments(
      speeches, variants, stubScorer, topN = 2)
    // week 202601 v1 scores: "The budget is late."=4, "We must act now!"=4,
    // "Nonsense, total nonsense."=3, "I disagree entirely."=3,
    // "The numbers say otherwise."=4  → top2 = the score-4 rows, speaker
    // asc then quote asc: Alice("The budget..."=4) vs Brian("The numbers..."=4)
    // tie on score → Alice Murphy < Brian Byrne; within Alice: quote asc
    val top601 = top.filter(col("variant_id") === "v1" && col("week_id") === "202601")
      .orderBy("week_rank").select("speaker_name", "quote", "score", "week_rank")
      .as[(String, String, Int, Int)].collect().toSeq
    assert(top601 == Seq(
      ("Alice Murphy", "The budget is late.", 4, 1),
      ("Alice Murphy", "We must act now!", 4, 2)))

    val sum = summary.as[(String, String, String, String, Long, Long, Long, Option[Double])]
      .collect().toSeq
    // ordered by (variant_id, week_id); scored_candidates: 202601 has 5
    // sentences, 202602 has 2
    assert(sum.map(r => (r._1, r._4, r._5, r._6)) == Seq(
      ("v1", "202601", 5L, 2L), ("v1", "202602", 2L, 2L),
      ("v2", "202601", 5L, 2L), ("v2", "202602", 2L, 2L)))
    assert(sum.forall(r => r._2 == (if (r._1 == "v1") "absurdist" else "deadpan")))
    assert(sum.forall(_._3 == "sentence_score"))
    // v2 scores are +10: max for v1/202601 = 4, v2/202601 = 14
    assert(sum.collect { case ("v1", _, _, "202601", _, _, m, _) => m }.head == 4L)
    assert(sum.collect { case ("v2", _, _, "202601", _, _, m, _) => m }.head == 14L)
    // avg_top_score = mean of retained rows (both top rows score 4 → 4.0)
    assert(sum.collect { case ("v1", _, _, "202601", _, _, _, a) => a }.head.contains(4.0))
    scored.unpersist()
    ()
  }

  test("summary keeps zero-top groups with top_rows=0 and null avg") {
    val (scored, _, _) = ExperimentOps.runExperiments(speeches, variants, stubScorer)
    // empty top set simulates a variant whose scorer returned nothing rankable
    val empty = ExperimentOps.selectTopRows(scored.filter(lit(false)), 2)
    val sum = ExperimentOps.buildSummary(empty, scored)
      .select("top_rows").as[Long].collect().toSeq
    assert(sum.nonEmpty && sum.forall(_ == 0L))
    scored.unpersist()
    ()
  }
}
