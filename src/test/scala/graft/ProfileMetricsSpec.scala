package graft

import graft.gold.ProfileMetrics

/** Profile-metrics mart fixtures: fuzzy-name fallback join with
  * ambiguous-key drop, NONE-label filter, top-issue tie-break, global
  * dense rank, int-rounded participation.
  */
class ProfileMetricsSpec extends SparkSpec {
  import spark.implicits._

  private val members = Seq(
    ("m1", "Alice Smith", "Dublin", "FF"),
    ("m2", "Bob Jones", "Cork", "FG"),
    ("m3", "Bob Jones", "Galway", "LAB")) // ambiguous name: fuzzy join must drop
    .toDF("member_code", "full_name", "constituency", "party")

  private val photos = Seq(("m1", "http://p/1.jpg")).toDF("member_code", "photo_url")

  test("fuzzy-name path: ambiguous names drop, issues count, NONE filtered") {
    val debates = Seq(
      ("Alice   SMITH", "2025-02-01", "Health"),
      ("Alice Smith", "2025-02-02", "Health"),
      ("Alice Smith", "2025-02-03", "Housing"),
      ("Alice Smith", "2025-02-04", "NONE"),     // filtered
      ("Alice Smith", "2024-02-01", "Health"),   // wrong year
      ("Bob Jones", "2025-02-01", "Health"))     // ambiguous → dropped
      .toDF("speaker_name", "speech_date", "issue")
    val votes = Seq(
      ("m1", "v1", "2025-03-01"), ("m1", "v1", "2025-03-01"), // dup pair collapses
      ("m1", "v2", "2025-03-02"), ("m2", "v2", "2025-03-02"),
      ("m2", "v3", "2025-03-03"), ("m9", "v4", "2025-03-04"))
      .toDF("member_code", "unique_vote_id", "date")

    val out = ProfileMetrics.build(members, votes, photos, debates, targetYear = 2025)
    val byCode = out.collect().map(r => r.getAs[String]("member_code") -> r).toMap

    val m1 = byCode("m1")
    assert(m1.getAs[Long]("speech_count") == 3)       // normalized-name matches, NONE+2024 excluded
    assert(m1.getAs[Long]("speech_rank") == 1)
    assert(m1.getAs[String]("top_issue") == "Health") // 2 health vs 1 housing
    assert(m1.getAs[Long]("top_issue_count") == 2)
    assert(m1.getAs[String]("photo_url") == "http://p/1.jpg")
    // participation: m1 in {v1,v2} of 4 distinct ids → 50%
    assert(m1.getAs[Long]("all_distinct_vote_ids") == 4)
    assert(m1.getAs[Long]("vote_participation_pct") == 50)

    val m2 = byCode("m2")
    assert(m2.getAs[Long]("speech_count") == 0)       // ambiguous name dropped
    assert(m2.getAs[Long]("distinct_votes_participated") == 2)
  }
}
