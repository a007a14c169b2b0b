package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus scrubbing operators for a training-data pipeline: PII
  * redaction and C4/RefinedWeb-style line-level boilerplate removal.
  *
  * Both are built to run at 100 TB:
  *   - redaction is expression-only (regexp in whole-stage codegen, no
  *     shuffle — scan-side cost only);
  *   - line filtering shuffles lines once to count cross-corpus
  *     frequency, then removes the (small) frequent-line set from every
  *     document with a broadcastable anti-join.
  */
object ScrubOps {

  /** RE2-compatible patterns (no backrefs/lookaround) so the same regex
    * runs identically under Java regex (Spark) and RE2 (DuckDB oracle).
    */
  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern: String = "\\d{3}[- .]\\d{3,4}[- .]\\d{4}"
  val ipPattern: String = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"

  /** Redact emails, phone numbers, and IPv4 addresses.
    *
    * Counts are measured on the raw text per pattern independently;
    * replacement is sequential email → phone → ip (documented order: an
    * address inside an already-redacted email does not double-count —
    * counts answer "what did the raw text contain", the clean text
    * answers "what survives"). Pure projection: codegen'd, no shuffle.
    */
  def redactPii(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    val clean =
      regexp_replace(
        regexp_replace(
          regexp_replace(t, emailPattern, "<EMAIL>"),
          phonePattern, "<PHONE>"),
        ipPattern, "<IP>")
    df.select(
      col(idCol).cast("long").as(idCol),
      regexp_count(t, lit(emailPattern)).cast("long").as("n_emails"),
      regexp_count(t, lit(phonePattern)).cast("long").as("n_phones"),
      regexp_count(t, lit(ipPattern)).cast("long").as("n_ips"),
      clean.as("text_clean"))
  }

  /** C4-style line-level boilerplate removal: a line that appears in
    * ≥ `minDocs` distinct documents is dropped from EVERY document
    * (navigation chrome, cookie banners, boilerplate headers), and the
    * surviving lines are reassembled in original order.
    *
    * Plan shape at scale: one explode + one (line → distinct-doc count)
    * aggregation — map-side combinable after the in-doc distinct — then
    * an anti-join of lines against the frequent set. The frequent set is
    * tiny relative to the corpus (boilerplate by definition repeats), so
    * Spark/AQE broadcasts it; the reassembly groupBy shuffles each doc's
    * surviving lines once, keyed by the high-cardinality doc id.
    *
    * Output: (id, n_lines, n_kept, text_clean), one row per input doc —
    * docs whose every line is boilerplate survive with empty text so the
    * caller decides whether to drop them.
    */
  def lineFrequencyFilter(df: DataFrame, textCol: String, idCol: String,
      minDocs: Int): DataFrame = {
    val id = col(idCol).cast("long").as(idCol)
    val lines = df.select(id, posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))

    // distinct docs per line; array_distinct before the explode would
    // also work but the (line, id) distinct lets the partial aggregate
    // shrink the shuffle the same way with one pass
    val frequent = lines.select(col("line"), col(idCol)).distinct()
      .groupBy("line").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select("line")

    val kept = lines.join(frequent, Seq("line"), "left_anti")

    val counts = df.select(id, size(split(col(textCol), "\n")).cast("long").as("n_lines"))
    counts.join(
        kept.groupBy(idCol).agg(
          count(lit(1)).cast("long").as("n_kept"),
          array_join(transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line")), "\n").as("text_clean")),
        Seq(idCol), "left")
      .select(col(idCol), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }
}
