package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sentence splitting + weekly candidate pipeline (SURVEY §2.3 F11, §2.7
  * W4; reference process/ridiculous_sentences_weekly.py:52-170, 406-421).
  * The split regex needs lookbehind+lookahead (Java regex in a flatMap —
  * per-document, trivially parallel); everything downstream is relational.
  */
object SentenceOps {

  private val SentenceSplit = """(?<=[.!?])\s+(?=(?:["“‘(\[])?[A-Z0-9])""".r
  private val WordRe = """\b[\w'-]+\b""".r

  def normalizeWs(s: String): String =
    Option(s).getOrElse("").replaceAll("\\s+", " ").trim

  def countWords(s: String): Int = WordRe.findAllIn(Option(s).getOrElse("")).length

  /** Dedupe key: lowered, quote/paren-stripped (…:141-143). */
  def normalizeForDedupe(s: String): String =
    normalizeWs(s).toLowerCase.replaceAll("""^[ "'“”‘’()\[\]]+|[ "'“”‘’()\[\]]+$""", "")

  /** F11: split on terminal punctuation followed by a capital/digit
    * (optionally quote-opened); pieces longer than maxWords with a
    * semicolon sub-split on it (…:151-170).
    */
  def splitSentences(text: String, maxWords: Int = 50): Seq[String] = {
    val cleaned = normalizeWs(text)
    if (cleaned.isEmpty) Nil
    else SentenceSplit.split(cleaned).toSeq.flatMap { part =>
      val piece = normalizeWs(part)
      if (piece.isEmpty) Nil
      else if (countWords(piece) > maxWords && piece.contains(";"))
        piece.split(";").map(normalizeWs).filter(_.nonEmpty).toSeq
      else Seq(piece)
    }
  }

  /** Candidate build: explode speeches into sentences with word-count
    * bounds and per-(week, speaker, dedupe-key) first-wins dedupe
    * (drop_duplicates subset :239 includes speaker_name); candidate ids
    * are sha256("week||normalize_ws(speaker)||sentence")[:24] (…:146-148).
    * maxWords governs BOTH the semicolon sub-split inside splitSentences
    * and the word-count filter, as in the reference where one
    * MAX_SENTENCE_WORDS constant feeds both.
    */
  def buildCandidates(speeches: DataFrame, weekCol: String, speakerCol: String,
                      textCol: String, minWords: Int = 5, maxWords: Int = 60): DataFrame = {
    val spark = speeches.sparkSession
    val enc = Encoders.tuple(Encoders.STRING, Encoders.STRING, Encoders.STRING)
    val splitMax = maxWords
    val exploded = speeches
      .select(col(weekCol).cast("string"), col(speakerCol).cast("string"), col(textCol).cast("string"))
      .as(enc)
      .flatMap { case (week, speaker, text) =>
        splitSentences(text, splitMax).map(s => (week, speaker, s))
      }(enc)
      .toDF("week_id", "speaker_name", "sentence")

    val measured = exploded
      .withColumn("word_count", udf(countWords _).apply(col("sentence")))
      .filter(col("word_count").between(minWords, maxWords))
      .withColumn("dedupe_key", udf(normalizeForDedupe _).apply(col("sentence")))
      .withColumn("candidate_id",
        substring(sha2(concat_ws("||", col("week_id"),
          udf(normalizeWs _).apply(col("speaker_name")), col("sentence")), 256), 1, 24))

    val w = Window.partitionBy("week_id", "speaker_name", "dedupe_key")
      .orderBy(col("candidate_id").asc)
    measured.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .drop("_rn", "dedupe_key")
  }

  /** W4 weekly top-N by score with the reference's deterministic ordering
    * (score desc, speaker asc, sentence asc; …:406-421).
    */
  def weeklyTopN(scored: DataFrame, n: Int = 10): DataFrame = {
    val w = Window.partitionBy("week_id")
      .orderBy(col("score").desc, col("speaker_name").asc, col("sentence").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= n)
  }
}
