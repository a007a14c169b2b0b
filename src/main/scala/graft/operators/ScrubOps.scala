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

  /** Span-level (substring) dedup: every fixed-length word span whose
    * corpus-wide occurrence count is ≥ `minCount` is removed — from
    * every document, at every covered word position (the simplified,
    * order-free variant of "deduplicating training data" substring
    * dedup; a keep-first variant needs a global occurrence order and is
    * a policy layer over the same coverage computation).
    *
    * Pipeline: explode (doc, start, spanHash) — one row per word, not
    * per word² — count span occurrences (map-side combinable), keep the
    * duplicated span set (small: duplication is the exception), explode
    * ONLY duplicated occurrences into covered positions, and rebuild
    * each text from its uncovered positions. Shuffles are keyed by span
    * hash and doc id; nothing is quadratic in corpus size.
    *
    * Spans are hashed (xxhash64-based, [[DedupOps.shingleHashesOfWordHashes]]
    * convention): collisions conflate spans at ~k²/2⁶⁴ probability —
    * the same accepted trade as the MinHash path.
    *
    * Output: (id, n_words, n_covered, text_clean) for every input doc;
    * with `emitWordHashes` an extra `wh_clean` array<long> of the
    * SURVIVING words' xxhash64 values, so a downstream shingle consumer
    * (the curation chain's near-dup stage) skips re-tokenizing and
    * re-hashing the cleaned text entirely.
    */
  def spanDedup(df: DataFrame, textCol: String, idCol: String,
      spanWords: Int, minCount: Int = 2,
      emitWordHashes: Boolean = false): DataFrame = {
    val id = col(idCol).cast("long").as(idCol)
    // each word hashes ONCE into _wh; span hashes fold over slices of it
    // (the per-span transform(slice(_ws,…), xxhash64) formulation re-hashed
    // every word spanWords times — lambda bodies get no CSE)
    val ws = df.select(id, split(DedupOps.normText(col(textCol)), " ").as("_ws"))
      .select(col(idCol), col("_ws"), transform(col("_ws"), w => xxhash64(w)).as("_wh"))
      .select(col(idCol), col("_ws"), col("_wh"),
        // (start, hash) structs for all spans; empty below spanWords
        when(size(col("_wh")) >= spanWords,
          transform(sequence(lit(0), size(col("_wh")) - spanWords),
            i => struct(i.as("start"),
              aggregate(slice(col("_wh"), i + 1, lit(spanWords)),
                lit(0L), (acc, x) => acc * lit(1099511628211L) + x).as("h"))))
          .otherwise(array().cast("array<struct<start:int,h:bigint>>")).as("_spans"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val occ = ws.select(col(idCol), explode(col("_spans")).as("s"))
      .select(col(idCol), col("s.start"), col("s.h"))
    val dup = occ.groupBy("h").agg(count(lit(1)).as("n")).filter(col("n") >= minCount)
      .select("h")
    val covered = occ.join(dup, Seq("h"))
      .select(col(idCol), explode(sequence(col("start"), col("start") + (spanWords - 1))).as("pos"))
      .distinct()
      .groupBy(idCol).agg(sort_array(collect_set(col("pos"))).as("_cov"))

    val joined = ws.join(covered, Seq(idCol), "left")
      // size(NULL) is -1 under the non-ANSI legacy conf — normalize the
      // no-coverage case to an empty array before measuring it
      .withColumn("_cov", coalesce(col("_cov"), array().cast("array<int>")))
    def uncovered(arr: Column): Column =
      transform(
        filter(zip_with(arr, sequence(lit(0), size(arr) - 1),
          (w, i) => struct(w.as("w"), i.as("i"))),
          s => !array_contains(col("_cov"), s.getField("i"))),
        s => s.getField("w"))
    val base = Seq(col(idCol),
      size(col("_ws")).cast("long").as("n_words"),
      size(col("_cov")).cast("long").as("n_covered"),
      array_join(uncovered(col("_ws")), " ").as("text_clean"))
    val cols = if (emitWordHashes) base :+ uncovered(col("_wh")).as("wh_clean") else base
    joined.select(cols: _*)
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
