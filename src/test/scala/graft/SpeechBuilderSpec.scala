package graft

import org.apache.spark.sql.functions._

import graft.silver.SpeechBuilder
import graft.sources.XmlDebateWalker.ParsedSpeech

/** silver_speeches normalization (reference table_speeches.py:228-283):
  * speaker match precedence/confidence, ref-derived member codes, text
  * hashes and counts. Plus the approx_count_distinct capability the
  * engine ships for the 100 TB north star (SURVEY §2.6 note).
  */
class SpeechBuilderSpec extends SparkSpec {
  import spark.implicits._

  private def speech(id: String, tlc: String, ref: String, text: String) =
    ParsedSpeech(id, "debate/1", "debate/sect1", "sect1", "2024-01-15", 1,
      ref, "Speaker", tlc, text, "en")

  test("speaker match: TLC href 1.0, ref-derived 0.8, unresolved null") {
    val ds = Seq(
      speech("s1", "John-Smith.D", "#JohnSmith", "A point."),
      speech("s2", null, "#member/Mary-Jones.D/x", "Another point."),
      speech("s3", null, "#someone", "Third point."))
      .toDS()
    val out = SpeechBuilder.normalize(ds, "source_file:abc", "raw/key.xml", "2024-01-16")
      .collect().map(r => r.getAs[String]("speech_id") -> (
        r.getAs[String]("speaker_member_code"),
        r.getAs[String]("speaker_match_method"),
        Option(r.getAs[java.lang.Double]("speaker_match_confidence")))).toMap
    assert(out("s1") == (("John-Smith.D", "xml_tlc_person_href", Some(1.0))))
    assert(out("s2") == (("Mary-Jones.D", "speaker_ref_member_code", Some(0.8))))
    assert(out("s3") == ((null, null, None)))
  }

  test("text hash and counts match reference formulas") {
    val ds = Seq(speech("s1", "m1", "#m", "two words")).toDS()
    val r = SpeechBuilder.normalize(ds, "sf", "key", "2024-01-16").collect().head
    assert(r.getAs[String]("speech_text_hash") ==
      java.security.MessageDigest.getInstance("SHA-256")
        .digest("two words".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(24))
    assert(r.getAs[Int]("word_count") == 2)
    assert(r.getAs[Int]("char_count") == 9)
  }

  test("approx_count_distinct stays within rsd of exact at sf0.001") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val (exact, approx) = li.agg(
      countDistinct(col("l_orderkey")).as("e"),
      approx_count_distinct(col("l_orderkey"), 0.02).as("a"))
      .as[(Long, Long)].collect().head
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }
}
