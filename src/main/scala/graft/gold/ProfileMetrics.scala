package graft.gold

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.{Fns, Udfs}

/** Member profile metrics (SURVEY §2.5 J5/J6, §2.6 A7/A8, §2.7 W2, §2.3
  * F15 int-rounded; reference process/build_member_profile_metrics.py:76-160):
  * roster ⟕ photos ⟕ speech metrics (global dense rank, top issue) ⟕
  * distinct-vote participation, with the fuzzy-name fallback join and
  * NONE-label filtering.
  */
object ProfileMetrics {

  private def nonBlank(c: org.apache.spark.sql.Column) = trim(coalesce(c, lit(""))) =!= ""

  def build(members: DataFrame, votes: DataFrame, photos: DataFrame,
            debates: DataFrame, targetYear: Int): DataFrame = {
    val base = members
      .withColumn("member_key", Udfs.normalizeName(col("full_name")))

    val photoLookup = photos.select(col("member_code"), col("photo_url"))
      .dropDuplicates("member_code")

    // speeches: issue labels per member (direct code, else fuzzy-name join
    // with ambiguous keys dropped entirely — pandas keep=False)
    val hasCode = debates.columns.contains("member_code") ||
      debates.columns.contains("speaker_member_code")
    val codeCol = if (debates.columns.contains("member_code")) "member_code" else "speaker_member_code"
    val speechesRaw =
      if (hasCode) debates.withColumn("member_code", col(codeCol).cast("string"))
      else {
        val lookup = base.select("member_code", "member_key")
          .withColumn("_n", count(lit(1)).over(Window.partitionBy("member_key")))
          .filter(col("_n") === 1).drop("_n")
        debates.withColumn("member_key", Udfs.normalizeName(col("speaker_name")))
          .join(lookup, Seq("member_key"), "inner")
      }
    val speeches = speechesRaw
      .withColumn("_d", Fns.parseIsoDate(col("speech_date")))
      .filter(col("_d").isNotNull && year(col("_d")) === targetYear)
      .withColumn("issue", trim(coalesce(col("issue"), lit(""))))
      .filter(nonBlank(col("member_code")) && col("issue") =!= "" && upper(col("issue")) =!= "NONE")

    val counts = speeches.groupBy("member_code")
      .agg(count(lit(1)).as("speech_count"))
      // global (unpartitioned) window = single-task sort: safe only
      // because the input is one row PER MEMBER (~174 in the reference
      // domain) after the groupBy — see RankOps for the scale-safe form
      .withColumn("speech_rank",
        dense_rank().over(Window.orderBy(col("speech_count").desc)))
    val topIssue = speeches.groupBy("member_code", "issue")
      .agg(count(lit(1)).as("top_issue_count"))
      .withColumn("_rn", row_number().over(Window.partitionBy("member_code")
        .orderBy(col("top_issue_count").desc, col("issue").asc)))
      .filter(col("_rn") === 1)
      .select(col("member_code"), col("issue").as("top_issue"), col("top_issue_count"))

    // votes: distinct (member, vote) participation against the global
    // distinct vote-id count, int-rounded percentage
    val votesYear = votes
      .withColumn("_d", Fns.parseIsoDate(col("date")))
      .filter(col("_d").isNotNull && year(col("_d")) === targetYear)
      .filter(nonBlank(col("member_code")) && nonBlank(col("unique_vote_id")))
    val totalVoteIds = votesYear.select("unique_vote_id").distinct().count()
    val voteMetrics = votesYear.select("member_code", "unique_vote_id").distinct()
      .groupBy("member_code")
      .agg(count(lit(1)).as("distinct_votes_participated"))
      .withColumn("vote_participation_pct",
        // count * 100.0 / total, in THIS operand order: the DuckDB oracle
        // (Parity q95) computes COUNT(*) * 100.0 / total, and the reverse
        // order (count / total * 100.0) can land on the other side of an
        // exact .5 rounding boundary for some count/total pairs
        if (totalVoteIds > 0)
          round(col("distinct_votes_participated") * 100.0 / totalVoteIds)
            .cast("long")
        else lit(0L))

    val out = base
      .join(photoLookup, Seq("member_code"), "left")
      .join(counts, Seq("member_code"), "left")
      .join(topIssue, Seq("member_code"), "left")
      .join(voteMetrics, Seq("member_code"), "left")
      .withColumn("photo_url", coalesce(col("photo_url"), lit("")))
      .withColumn("top_issue", coalesce(col("top_issue"), lit("")))
      .withColumn("all_distinct_vote_ids", lit(totalVoteIds))
    val zeroFilled = Seq("speech_count", "speech_rank", "top_issue_count",
      "vote_participation_pct", "distinct_votes_participated")
      .foldLeft(out)((df, c) => df.withColumn(c, coalesce(col(c).cast("long"), lit(0L))))
    zeroFilled.select("member_code", "full_name", "constituency", "party", "photo_url",
        "top_issue", "top_issue_count", "vote_participation_pct",
        "distinct_votes_participated", "all_distinct_vote_ids", "speech_count", "speech_rank")
      .orderBy(col("speech_count").desc, col("full_name").asc)
  }
}
