package graft.sources

import scala.collection.mutable
import scala.xml.{Atom, Elem, Node, XML}

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}

/** Akoma Ntoso debate-XML → speeches flattener (SURVEY §2.4 N6; reference
  * extract/oireachtas/xml_debates.py:31-225). Stateful within one document
  * (section stack, speech-order counter, document language) — sequential
  * per document, trivially parallel across documents via flatMap.
  */
object XmlDebateWalker {

  /** Output row (reference ParsedSpeech, xml_debates.py:17-29). */
  final case class ParsedSpeech(
      speech_id: String,
      debate_id: String,
      debate_section_id: String,
      section_eid: String,
      debate_date: String,
      speech_order: Int,
      speaker_ref: String,
      speaker_name: String,
      speaker_member_code: String,
      speech_text: String,
      language: String)

  private val NonJoinSectionNames = Set("prelude", "division", "ta", "nil", "staon")
  private val SectionTags = Set("debateSection", "section", "subsection")
  private val SpeakerChildTags = Set("from", "docProponent", "speaker")
  private val ExcludedTextTags = Set("from", "recordedTime")
  private val XmlNs = "http://www.w3.org/XML/1998/namespace"

  /** python safe_text parity: null → default, else str().strip(). */
  private def safeText(v: Any): String = v match {
    case null => ""
    case s: String => s.trim
    case other => other.toString.trim
  }

  /** Reference stable_hash (normalize.py:73-76): sha256 of the "|"-join
    * of safe_text(part).lower(), hex prefix.
    */
  def stableHash(parts: Seq[Any], length: Int): String = {
    val joined = parts.map(p => safeText(p).toLowerCase).mkString("|")
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(joined.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(length)
  }

  private def attr(e: Elem, keys: String*): Option[String] =
    keys.iterator.flatMap(k => e.attribute(k).map(_.text)).find(_.nonEmpty)

  private def langAttr(e: Elem): Option[String] =
    e.attribute(XmlNs, "lang").map(_.text).filter(_.nonEmpty)
      .orElse(attr(e, "lang"))

  private def normText(s: String): String = s.replaceAll("\\s+", " ").trim

  /** Document-order text atoms under a node (ElementTree itertext parity). */
  private def textAtoms(n: Node): Seq[String] =
    n.descendant.collect { case a: Atom[_] => a.text }

  /** Speech text assembly (xml_debates.py:215-225): own text nodes and
    * child subtrees except `from`/`recordedTime` bodies; tails of excluded
    * children are separate sibling text nodes in scala-xml, so they are
    * naturally retained.
    */
  private def speechText(e: Elem): String = {
    val parts = e.child.flatMap {
      case c: Elem if ExcludedTextTags(c.label) => Nil
      case c: Elem => textAtoms(c)
      case t => Seq(t.text)
    }
    normText(parts.mkString(" "))
  }

  private def speakerRef(e: Elem): Option[String] =
    attr(e, "by", "as", "refersTo", "source").orElse {
      e.child.collectFirst {
        case c: Elem if SpeakerChildTags(c.label) && attr(c, "href", "refersTo", "by", "as").isDefined =>
          attr(c, "href", "refersTo", "by", "as").get
      }
    }

  private def speakerName(e: Elem, ref: Option[String]): Option[String] = {
    val fromChild = e.child.collectFirst {
      case c: Elem if SpeakerChildTags(c.label) && normText(textAtoms(c).mkString(" ")).nonEmpty =>
        normText(textAtoms(c).mkString(" "))
    }
    fromChild.orElse(ref.filter(_ != "#").map { r =>
      r.trim.dropWhile(_ == '#').replaceAll("[_-]+", " ")
    }.filter(_.nonEmpty))
  }

  private def memberCodeFromHref(href: Option[String]): Option[String] = {
    val marker = "/member/id/"
    href.filter(_.contains(marker))
      .map(_.split(java.util.regex.Pattern.quote(marker), 2)(1).split("/", 2)(0).trim)
      .filter(_.nonEmpty)
  }

  private final case class Person(eId: String, href: Option[String],
                                  showAs: Option[String], memberCode: Option[String])

  private def personReferences(root: Elem): Map[String, Person] =
    (root \\ "_").collect { case e: Elem if e.label == "TLCPerson" => e }
      .flatMap { e =>
        attr(e, "eId", "eid", "id").map { eid =>
          val href = attr(e, "href", "refersTo", "uri")
          eid.dropWhile(_ == '#') ->
            Person(eid, href, attr(e, "showAs", "name"), memberCodeFromHref(href))
        }
      }.toMap

  private def sectionId(debateId: String, sectionEid: String): String = {
    val base = if (debateId.contains("/")) debateId.substring(0, debateId.lastIndexOf('/')) else debateId
    s"$base/$sectionEid"
  }

  /** Parse one debate document into ordered speeches. */
  def parse(debateId: String, debateDate: String, xml: String,
            defaultLanguage: String = "en"): Seq[ParsedSpeech] = {
    val root = XML.loadString(xml)
    val people = personReferences(root)

    val rows = mutable.ArrayBuffer.empty[ParsedSpeech]
    // (section_id, section_eid, section_name)
    val stack = mutable.ArrayBuffer.empty[(String, String, String)]
    var speechOrder = 0
    var docLang: Option[String] = None

    def joinSection: (String, String) = {
      stack.reverseIterator
        .find { case (_, _, name) => !NonJoinSectionNames(Option(name).getOrElse("").toLowerCase) }
        .orElse(stack.headOption)
        .map { case (id, eid, _) => (id, eid) }
        .getOrElse((null, null))
    }

    def walk(e: Elem): Unit = {
      if (docLang.isEmpty) docLang = langAttr(e)

      val isSection = SectionTags(e.label)
      if (isSection) {
        val eid = attr(e, "eId", "eid", "id").orNull
        val name = attr(e, "name").orNull
        val sid = if (eid == null) null else sectionId(debateId, eid)
        stack += ((sid, eid, name))
      }

      if (e.label == "speech") {
        val text = speechText(e)
        if (text.nonEmpty) {
          speechOrder += 1
          val (sid, seid) = joinSection
          val ref = speakerRef(e)
          val person = people.get(ref.getOrElse("").dropWhile(_ == '#'))
          val name = speakerName(e, ref).orElse(person.flatMap(_.showAs))
          val lang = langAttr(e).orElse(docLang).getOrElse(defaultLanguage)
          rows += ParsedSpeech(
            speech_id = "speech:" + stableHash(
              Seq(debateId, sid, speechOrder, ref.orNull, text), 24),
            debate_id = debateId,
            debate_section_id = sid,
            section_eid = seid,
            debate_date = debateDate,
            speech_order = speechOrder,
            speaker_ref = ref.orNull,
            speaker_name = name.orNull,
            speaker_member_code = person.flatMap(_.memberCode).orNull,
            speech_text = text,
            language = lang)
        }
        // reference returns without recursing into speech children
      } else {
        e.child.foreach { case c: Elem => walk(c); case _ => () }
        if (isSection) stack.remove(stack.length - 1)
      }
    }

    walk(root)
    rows.toSeq
  }

  /** Distributed form: (debate_id, debate_date, xml) rows → speeches. */
  def walkDataset(docs: Dataset[(String, String, String)]): Dataset[ParsedSpeech] = {
    implicit val enc = Encoders.product[ParsedSpeech]
    docs.flatMap { case (id, date, xml) => parse(id, date, xml) }
  }
}
