package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** DSIR hashed importance scoring: model semantics (target-like text
  * outscores junk), the exact integer contract (a driver-side replay of
  * the published recipe reproduces every score bit-for-bit), and
  * partition determinism.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target docs (ids % 10 == 0) speak "quality" vocabulary; raw docs are
  // either target-like or junk wordlists
  private val targetText = "the quick brown fox jumps over the lazy dog near the river bank"
  private val junkText = "zzqx wvrk jjfp qqry xxlm zzqx ppwt kkhg zzqx mmvd"
  private lazy val docs = Seq(
    (0L, targetText),
    (10L, "the quick dog jumps over the brown fox near the lazy river"),
    (20L, "a brown dog and a quick fox near the river bank"),
    (1L, "the quick brown fox near the lazy dog"), // target-like raw
    (2L, junkText), // junk raw
    (3L, "the river bank near the dog"), // target-like raw
    (4L, ""), // empty raw: no tokens, absent from output
    (5L, "zzqx wvrk jjfp the") // mostly junk raw
  ).toDF("doc_id", "text")

  private lazy val scored =
    TextOps.dsirScores(docs, "text", "doc_id", col("doc_id") % 10 === 0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("target docs and token-less docs are absent; raw docs score once each") {
    assert(scored.keySet == Set(1L, 2L, 3L, 5L))
  }

  test("target-like raw text outscores junk (per token, and absolutely)") {
    val (s1, n1) = scored(1L)
    val (s2, n2) = scored(2L)
    assert(s1 > s2, "target-vocabulary doc must outscore the junk wordlist")
    assert(s1.toDouble / n1 > s2.toDouble / n2)
    // mostly-junk sits between all-junk and target-like per token
    val (s5, n5) = scored(5L)
    assert(s5.toDouble / n5 > s2.toDouble / n2)
    assert(s5.toDouble / n5 < s1.toDouble / n1)
  }

  test("scores equal a driver-side replay of the published recipe (exact integers)") {
    def toks(t: String): Seq[String] =
      t.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    def bucket(w: String): String = {
      val d = MessageDigest.getInstance("SHA-256")
        .digest(("graft-dsir:" + w).getBytes("UTF-8"))
      f"${d(0) & 0xff}%02x"
    }
    val rows = Seq(0L -> targetText,
      10L -> "the quick dog jumps over the brown fox near the lazy river",
      20L -> "a brown dog and a quick fox near the river bank",
      1L -> "the quick brown fox near the lazy dog",
      2L -> junkText,
      3L -> "the river bank near the dog",
      5L -> "zzqx wvrk jjfp the")
    val occ = rows.flatMap { case (id, t) => toks(t).map(w => (id, id % 10 == 0, bucket(w))) }
    val tTot = occ.count(_._2).toLong
    val rTot = occ.count(!_._2).toLong
    val tCnt = occ.filter(_._2).groupBy(_._3).map { case (b, o) => b -> o.size.toLong }
    val rCnt = occ.filter(!_._2).groupBy(_._3).map { case (b, o) => b -> o.size.toLong }
    def lamQ(b: String): Long = {
      val t = tCnt.getOrElse(b, 0L); val r = rCnt.getOrElse(b, 0L)
      math.floor(math.log(((t + 1) * (rTot + 256)).toDouble /
        ((r + 1) * (tTot + 256)).toDouble) * 1e6).toLong
    }
    val expected = occ.filter(!_._2).groupBy(_._1).map { case (id, o) =>
      id -> (o.map(x => lamQ(x._3)).sum, o.size.toLong)
    }
    assert(scored == expected)
  }

  test("deterministic under repartitioning") {
    val again = TextOps.dsirScores(docs.repartition(5), "text", "doc_id",
        col("doc_id") % 10 === 0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(again == scored)
  }
}
