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

  // ---- XML walker round-trip: generated debates parse back exactly ----
  // The expected rows are computed AT GENERATION TIME from the tree being
  // rendered (section stack, join skip-list, speaker fallback), so the
  // property pins the walker against the generator's structural intent
  // across random nesting/name/speaker/blank-speech combinations — the
  // cases a fixed golden fixture can't enumerate.

  private sealed trait DebNode
  private final case class SpeechNode(ref: Option[String], from: Option[String],
                                      text: String) extends DebNode
  private final case class SectionNode(name: String, children: List[DebNode]) extends DebNode

  private val speechTextGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 6)
    ws <- Gen.listOfN(n, word)
    sep <- Gen.oneOf(" ", "  ") // exercises whitespace collapse
  } yield ws.mkString(sep)

  private val speechGen: Gen[SpeechNode] = for {
    ref <- Gen.option(word.map("#spk_" + _))
    from <- Gen.option(Gen.listOfN(2, word).map(_.mkString(" ")))
    text <- speechTextGen
  } yield SpeechNode(ref, from, text)

  private def sectionGen(depth: Int): Gen[SectionNode] = for {
    name <- Gen.oneOf("main topic", "division", "prelude", "ta", "questions")
    n <- Gen.chooseNum(0, 4)
    children <- Gen.listOfN(n,
      if (depth >= 2) speechGen.map(s => s: DebNode)
      else Gen.frequency(3 -> speechGen.map(s => s: DebNode),
        1 -> Gen.lzy(sectionGen(depth + 1).map(s => s: DebNode))))
  } yield SectionNode(name, children)

  private val debateGen: Gen[List[SectionNode]] =
    Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, sectionGen(0)))

  property("XML walker round-trips generated debates") =
    Prop.forAll(debateGen) { sections =>
      val NonJoin = Set("prelude", "division", "ta", "nil", "staon")
      def norm(s: String) = s.replaceAll("\\s+", " ").trim
      var eidN = 0
      var order = 0
      val xml = new StringBuilder("<debate xml:lang=\"ga\"><debateBody>")
      val expected = scala.collection.mutable.ArrayBuffer
        .empty[(Int, String, String, String, String)]
      // stack is innermost-first; the walker joins the innermost section
      // whose name is not in the skip-list, else the OUTERMOST entry
      def walk(n: DebNode, stack: List[(String, String)]): Unit = n match {
        case SectionNode(name, children) =>
          eidN += 1; val eid = s"sec$eidN"
          xml.append(s"""<debateSection eId="$eid" name="$name">""")
          children.foreach(walk(_, (eid, name) :: stack))
          xml.append("</debateSection>")
        case SpeechNode(ref, from, text) =>
          xml.append("<speech")
          ref.foreach(r => xml.append(s""" by="$r""""))
          xml.append(">")
          from.foreach(f => xml.append(s"<from>$f</from>"))
          xml.append(s"<p>$text</p></speech>")
          if (norm(text).nonEmpty) {
            order += 1
            val joined = stack.find(s => !NonJoin(s._2))
              .orElse(stack.lastOption).map(_._1).orNull
            val speaker = from.map(norm).filter(_.nonEmpty)
              .orElse(ref.map(_.dropWhile(_ == '#').replaceAll("[_-]+", " "))
                .filter(_.nonEmpty))
              .orNull
            expected += ((order, joined, ref.orNull, speaker, norm(text)))
          }
      }
      sections.foreach(walk(_, Nil))
      xml.append("</debateBody></debate>")
      val rows = XmlDebateWalker.parse("deb1", "2024-01-01", xml.toString)
      val got = rows.map(r =>
        (r.speech_order, r.section_eid, r.speaker_ref, r.speaker_name, r.speech_text))
      got == expected.toSeq &&
        rows.forall(_.language == "ga") &&
        rows.forall(r => r.speech_id.startsWith("speech:") &&
          r.speech_id.length == "speech:".length + 24)
    }
}
