package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Fns

/** Text-analysis operators for a training-data pipeline: language ID
  * (marker-word heuristic), quality scoring, token counting, document
  * fingerprinting. All expression-only → whole-stage codegen, trivially
  * distributed (no per-doc state).
  */
object TextOps {

  /** Marker-word lists per language. Tiny on purpose: broadcast as
    * literals into the plan; swap for real frequency tables in production.
    */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  private def words(text: Column): Column = split(DedupOps.normText(text), " ")

  /** Count of words belonging to a marker list (with multiplicity). */
  def markerCount(text: Column, lang: String): Column =
    size(filter(words(text), w => w.isin(markers(lang): _*)))

  /** Heuristic language ID: argmax marker count, alphabetical tie-break,
    * "und" (undetermined) when no marker hits.
    */
  def langId(text: Column): Column = {
    val scored = markers.keys.toSeq.sorted.map(l => (l, markerCount(text, l)))
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    // when-chain in alphabetical order ⇒ first max wins the tie
    scored.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Quality metrics + a composite score in [0,1]:
    * word count band, mean word length band, distinct-word ratio.
    * Integer-derived doubles only → deterministic cross-engine.
    */
  def qualityMetrics(df: DataFrame, textCol: String): DataFrame = {
    val w = words(col(textCol))
    val nWords = size(w)
    val nDistinct = size(array_distinct(w))
    val nChars = length(col(textCol))
    df.withColumn("n_words", nWords.cast("long"))
      .withColumn("n_chars", nChars.cast("long"))
      .withColumn("distinct_ratio", nDistinct.cast("double") / nWords)
      .withColumn("mean_word_len",
        (nChars - (nWords - 1)).cast("double") / nWords)
      .withColumn("quality_score",
        (when(nWords.between(20, 1000), lit(0.5)).otherwise(lit(0.0)) +
          when((nDistinct.cast("double") / nWords) >= 0.3, lit(0.5)).otherwise(lit(0.0))))
      .withColumn("quality_band",
        when(col("quality_score") >= 1.0, "high")
          .when(col("quality_score") >= 0.5, "medium")
          .otherwise("low"))
  }

  /** Document fingerprint: sha256 of normalized text (exact identity) —
    * the key for exact dedupe and incremental skip logic.
    */
  def fingerprint(text: Column): Column = sha2(DedupOps.normText(text), 256)

  /** Token count re-export (BPE-ish regex proxy). */
  def tokenCount(text: Column): Column = Fns.tokenCount(text)
}
