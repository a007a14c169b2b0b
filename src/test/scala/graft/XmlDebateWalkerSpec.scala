package graft

import graft.sources.XmlDebateWalker

/** Golden parity test: expected tuples captured from the reference parser
  * (extract/oireachtas/xml_debates.py parse_debate_xml) run on this same
  * fixture — speech ids, section joining, skip-list, tails, person
  * resolution, empty-speech suppression must all match byte-for-byte.
  */
class XmlDebateWalkerSpec extends SparkSpec {

  private val fixture =
    """<akomaNtoso xmlns="http://docs.oasis-open.org/legaldocml/ns/akn/3.0" xml:lang="en">
      | <debate>
      |  <meta><references>
      |    <TLCPerson eId="JohnSmith" href="https://data.oireachtas.ie/ie/oireachtas/member/id/John-Smith.D.2020-01-01" showAs="John Smith"/>
      |    <TLCPerson eId="MaryJones" href="/member/id/Mary-Jones.D" showAs="Mary Jones"/>
      |  </references></meta>
      |  <debateBody>
      |   <debateSection eId="dbsect_1" name="prelude">
      |     <speech by="#JohnSmith"><p>Opening remarks here.</p></speech>
      |   </debateSection>
      |   <debateSection eId="dbsect_2" name="mainDebate">
      |     <heading>Main topic</heading>
      |     <speech by="#MaryJones"><from>Ms. Mary Jones</from><p>First point.</p><p>Second   point.</p></speech>
      |     <debateSection eId="dbsect_2_1" name="division">
      |       <speech by="#JohnSmith"><recordedTime time="10:00">10:00</recordedTime><p>Vote comment.</p></speech>
      |     </debateSection>
      |     <speech as="#unknown_speaker"><p xml:lang="ga">Focal eile.</p></speech>
      |     <speech by="#JohnSmith"><p>   </p></speech>
      |   </debateSection>
      |  </debateBody>
      | </debate>
      |</akomaNtoso>""".stripMargin

  test("walker matches the reference parser's golden output") {
    val rows = XmlDebateWalker.parse("debate/2024-01-15/dail", "2024-01-15", fixture)
    val got = rows.map(r => (r.speech_id, r.debate_section_id, r.section_eid, r.speech_order,
      r.speaker_ref, r.speaker_name, r.speaker_member_code, r.speech_text, r.language))
    val expected = Seq(
      ("speech:2c1460f4e929bc733385cd45", "debate/2024-01-15/dbsect_1", "dbsect_1", 1,
        "#JohnSmith", "JohnSmith", "John-Smith.D.2020-01-01", "Opening remarks here.", "en"),
      ("speech:1301efd03fc7c80d42506ba6", "debate/2024-01-15/dbsect_2", "dbsect_2", 2,
        "#MaryJones", "Ms. Mary Jones", "Mary-Jones.D", "First point. Second point.", "en"),
      ("speech:9230fb1839c770129e18b409", "debate/2024-01-15/dbsect_2", "dbsect_2", 3,
        "#JohnSmith", "JohnSmith", "John-Smith.D.2020-01-01", "Vote comment.", "en"),
      ("speech:d6161f66a9fa2f8d3b925e47", "debate/2024-01-15/dbsect_2", "dbsect_2", 4,
        "#unknown_speaker", "unknown speaker", null, "Focal eile.", "en"))
    assert(got == expected)
  }

  test("walkDataset distributes the parse across documents") {
    import spark.implicits._
    val docs = Seq(
      ("debate/2024-01-15/dail", "2024-01-15", fixture),
      ("debate/2024-01-16/dail", "2024-01-16", fixture)).toDS()
    val out = XmlDebateWalker.walkDataset(docs)
    assert(out.count() == 8)
    assert(out.filter($"debate_id" === "debate/2024-01-16/dail").count() == 4)
    // speech ids differ across debates (debate_id is hashed in)
    assert(out.select("speech_id").distinct().count() == 8)
  }
}
