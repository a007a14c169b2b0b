package graft.silver

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.sources.XmlDebateWalker.ParsedSpeech

/** silver_speeches normalization on top of the XML walk (SURVEY §2.4 N6 →
  * silver; reference table_speeches.py:228-283): speaker resolution with
  * match method/confidence, text hashes, word/char counts.
  */
object SpeechBuilder {

  /** member code recovered from a speaker ref like "#member/John-Smith.D"
    * (table_speeches.py:264-273).
    */
  val memberCodeFromRef: org.apache.spark.sql.Column => org.apache.spark.sql.Column = { ref =>
    val t = regexp_replace(trim(coalesce(ref, lit(""))), "^#+", "")
    val slash = regexp_extract(t, "member/([^/]+)", 1)
    val dash = regexp_extract(t, "member-([^/]+)", 1)
    val cand = when(slash =!= "", slash).when(dash =!= "", dash).otherwise(lit(""))
    when(trim(cand) === "", lit(null)).otherwise(trim(cand))
  }

  /** Normalize parsed speeches into the silver_speeches shape. */
  def normalize(speeches: Dataset[ParsedSpeech], sourceFileId: String,
                xmlSourceKey: String, snapshotDate: String): DataFrame = {
    val df = speeches.toDF()
    val tlcCode = when(trim(coalesce(col("speaker_member_code"), lit(""))) === "", lit(null))
      .otherwise(col("speaker_member_code"))
    val refCode = memberCodeFromRef(col("speaker_ref"))
    df.withColumn("_tlc", tlcCode)
      .withColumn("_ref_code", refCode)
      .withColumn("speaker_member_code", coalesce(col("_tlc"), col("_ref_code")))
      .withColumn("speaker_match_method",
        when(col("_tlc").isNotNull, "xml_tlc_person_href")
          .when(col("_ref_code").isNotNull, "speaker_ref_member_code"))
      .withColumn("speaker_match_confidence",
        when(col("_tlc").isNotNull, lit(1.0))
          .when(col("_ref_code").isNotNull, lit(0.8)).cast("double"))
      .withColumn("speech_text_hash", substring(sha2(col("speech_text"), 256), 1, 24))
      .withColumn("word_count",
        when(col("speech_text") === "", lit(0)).otherwise(size(split(col("speech_text"), "\\s+"))))
      .withColumn("char_count", length(col("speech_text")))
      .withColumn("source_file_id", lit(sourceFileId))
      .withColumn("xml_source_key", lit(xmlSourceKey))
      .withColumn("snapshot_date", lit(snapshotDate))
      .drop("_tlc", "_ref_code", "section_eid")
  }
}
