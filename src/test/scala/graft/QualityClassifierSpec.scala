package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Trained quality classifier: the model separates a separable fixture,
  * every trained margin matches a driver-side replay of the exact
  * integer recipe, and the judgment is partition-deterministic.
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val quality =
    "thoughtful prose with varied vocabulary and complete sentences about science history and culture"
  private val junk = "zzqx wvrk jjfp qqry xxlm ppwt kkhg mmvd rrtz bbnj"

  // ids ending in 0 are target (all quality); raw side is junk except
  // two probes: 45 speaks quality vocabulary, 46 junk
  private lazy val rows: Seq[(Long, String)] =
    (0 until 10).map(i => (i * 10L, quality + s" extra$i")) ++
      (0 until 10).map(i => (i * 10L + 2L, junk + s" filler$i")) ++
      Seq((45L, quality), (46L, junk))
  private lazy val docs = rows.toDF("doc_id", "text")

  private lazy val scored =
    TextOps.qualityClassifier(docs, "text", "doc_id", col("doc_id") % 10 === 0, steps = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap

  test("raw docs only; quality-vocabulary probe outscores the junk probe") {
    assert(!scored.keySet.exists(_ % 10 == 0), "target docs never score")
    val (mQuality, pQuality) = scored(45L)
    val (mJunk, pJunk) = scored(46L)
    assert(mQuality > mJunk, "margin must rank target-like raw text above junk")
    assert(pQuality, "the quality probe classifies as target-like")
    assert(!pJunk, "the junk probe classifies as raw")
    // the flag is exactly the margin sign
    scored.values.foreach { case (m, p) => assert(p == (m > 0L)) }
  }

  test("trained margins equal a driver-side replay of the exact recipe") {
    def toks(t: String): Seq[String] =
      t.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    def bucket(w: String): String = {
      val d = MessageDigest.getInstance("SHA-256")
        .digest(("graft-qc:" + w).getBytes("UTF-8"))
      f"${d(0) & 0xff}%02x"
    }
    def tdiv(a: Long, b: Long): Long = a / b // Java: truncates toward zero
    val feat: Map[Long, Set[String]] =
      rows.map { case (id, t) => id -> toks(t).map(bucket).toSet }.toMap
    val y: Map[Long, Long] = rows.map { case (id, _) => id -> (if (id % 10 == 0) 1000000L else 0L) }.toMap
    val n = feat.size.toLong
    var w = feat.values.flatten.toSet.map((b: String) => b -> 0L).toMap
    for (_ <- 1 to 3) {
      val g = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      feat.foreach { case (d, bs) =>
        val m = bs.iterator.map(w).sum
        val p = math.floor(1e6 / (1.0 + math.exp(-m / 1e6))).toLong
        val r = p - y(d)
        bs.foreach(b => g(b) += r)
      }
      w = w.map { case (b, wb) => b -> (wb - tdiv(g(b) * TextOps.QcEtaNum, n)) }
    }
    val expected = feat.collect { case (d, bs) if y(d) == 0L =>
      val m = bs.iterator.map(w).sum
      d -> (m, m > 0L)
    }
    assert(scored == expected)
  }

  test("deterministic under repartitioning") {
    val again = TextOps.qualityClassifier(docs.repartition(5), "text", "doc_id",
        col("doc_id") % 10 === 0, steps = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(again == scored)
  }
}
