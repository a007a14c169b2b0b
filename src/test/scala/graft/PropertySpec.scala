package graft

import java.time.LocalDate

import org.scalacheck.{Gen, Prop, Properties}

import graft.operators.EnrichOps
import graft.sources.XmlDebateWalker

/** Property tests (SURVEY §5 test plan): hash stability, week-id calendar
  * laws, sentence-splitter invariants, JSON canonicalization. Driver-free
  * properties only — Spark-dependent laws (upsert idempotence) live in
  * MergeOpsSpec where a session exists.
  */
object PropertySpec extends Properties("graft") {

  private val word = Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(8))

  property("stableHash is deterministic and length-bounded") =
    Prop.forAll(Gen.listOfN(3, word), Gen.choose(4, 64)) { (parts, n) =>
      val a = XmlDebateWalker.stableHash(parts, n)
      val b = XmlDebateWalker.stableHash(parts, n)
      a == b && a.length == n && a.matches("[0-9a-f]+")
    }

  property("stableHash is case-insensitive per reference semantics") =
    Prop.forAll(Gen.listOfN(3, word)) { parts =>
      XmlDebateWalker.stableHash(parts.map(_.toUpperCase), 16) ==
        XmlDebateWalker.stableHash(parts, 16)
    }

  private val dates = Gen.choose(0L, 365L * 80)
    .map(d => LocalDate.of(1990, 1, 1).plusDays(d))

  /** JVM mirror of the Fns.weekId column expression, for law checking. */
  private def weekIdJvm(d: LocalDate): Long = {
    def firstMonday(y: Int): LocalDate = {
      val jan1 = LocalDate.of(y, 1, 1)
      jan1.plusDays((8 - jan1.getDayOfWeek.getValue) % 7)
    }
    val fm = firstMonday(d.getYear)
    val (yy, f) = if (d.isBefore(fm)) (d.getYear - 1, firstMonday(d.getYear - 1)) else (d.getYear, fm)
    yy * 100L + (java.time.temporal.ChronoUnit.DAYS.between(f, d) / 7 + 1)
  }

  property("weekId weeks are 7-day aligned: same id iff same Monday") =
    Prop.forAll(dates) { d =>
      val monday = d.minusDays((d.getDayOfWeek.getValue + 6) % 7)
      (0 to 6).forall(i => weekIdJvm(monday.plusDays(i)) == weekIdJvm(monday))
    }

  property("weekId is monotone over consecutive weeks") =
    Prop.forAll(dates) { d =>
      weekIdJvm(d) <= weekIdJvm(d.plusDays(7))
    }

  property("weekId week numbers stay in [1,53]") =
    Prop.forAll(dates) { d =>
      val w = weekIdJvm(d) % 100
      w >= 1 && w <= 53
    }

  property("splitSentences loses no non-whitespace content on simple text") =
    Prop.forAll(Gen.listOfN(12, word)) { ws =>
      val text = ws.mkString(" ") + "."
      val joined = graft.operators.SentenceOps.splitSentences(text).mkString(" ")
      joined.replaceAll("\\s", "") == text.replaceAll("\\s", "")
    }

  property("parseScores round-trips any id/score batch") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.identifier.map(_.take(10))).map(_.distinct),
      Gen.choose(1, 100)) { (ids, score) =>
      ids.isEmpty || {
        val json = ids.map(id => s"""{"candidate_id":"$id","score":$score}""")
          .mkString("[", ",", "]")
        EnrichOps.parseScores(json, ids) == ids.map(_ -> score.toLong).toMap
      }
    }

  property("stableJson write/parse round-trips string maps") =
    Prop.forAll(Gen.mapOf(Gen.zip(Gen.identifier.map(_.take(8)), word))) { m =>
      val any: Map[String, Any] = m.map { case (k, v) => k -> (v: Any) }
      graft.io.StableJson.parse(graft.io.StableJson.write(any)) == any
    }
}
