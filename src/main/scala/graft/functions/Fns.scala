package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function library re-expressing the reference's normalize kernel
  * (reference: extract/oireachtas/normalize.py) as Catalyst column
  * expressions. Everything here stays inside whole-stage codegen — no UDFs
  * except where the semantics genuinely need JVM code (NFKD folding,
  * stable-JSON record hash); those are isolated in [[Udfs]].
  */
object Fns {

  /** Null-safe trimmed text with default (reference: normalize.py:20-26).
    * Empty-after-trim → default.
    */
  def safeText(c: Column, default: String = ""): Column =
    coalesce(nullif(trim(c), lit("")), lit(default))

  def nullif(c: Column, v: Column): Column = when(c === v, lit(null)).otherwise(c)

  /** First non-blank across columns (reference:
    * table_gold_current_members.py:241-250).
    */
  def coalesceNonBlank(cols: Column*): Column =
    coalesce(cols.map(c => nullif(trim(c), lit(""))): _*)

  /** Truthy-string predicate: "true","1","yes","y" case-insensitive
    * (reference: table_gold_current_members.py:253-256).
    */
  def truthy(c: Column): Column =
    lower(trim(c)).isin("true", "1", "yes", "y")

  /** The reference's surrogate-key generator (normalize.py:73-76):
    * sha256 of the lowercased "|"-join of parts, hex prefix of length n.
    * Each part is stringified first; nulls become empty string.
    */
  def stableHash(n: Int, parts: Column*): Column =
    substring(
      sha2(lower(concat_ws("|", parts.map(p => coalesce(p.cast("string"), lit(""))): _*)), 256),
      1, n)

  /** sha256 row id over "||"-joined fields, 24-hex prefix
    * (reference: llm_table_runner.py:133-135).
    */
  def rowId24(parts: Column*): Column =
    substring(sha2(concat_ws("||", parts.map(p => coalesce(p.cast("string"), lit(""))): _*), 256), 1, 24)

  /** Lenient ISO date parse (reference: normalize.py:47-60): try the
    * first-10-chars ISO prefix, then dd/MM/yyyy, dd-MM-yyyy, yyyyMMdd.
    * Unparsable → null (non-ANSI cast semantics).
    */
  def parseIsoDate(c: Column): Column = {
    val s = trim(c)
    coalesce(
      try_to_date(substring(s, 1, 10), "yyyy-MM-dd"),
      try_to_date(s, "dd/MM/yyyy"),
      try_to_date(s, "dd-MM-yyyy"),
      try_to_date(s, "yyyyMMdd"))
  }

  /** Open-ended inclusive validity-range predicate vs a given as-of date
    * (reference: normalize.py:96-115): null bound = open; unparsable
    * bound handled by parseIsoDate→null which here means open too only
    * for blank; future start ⇒ false.
    */
  def isCurrentRange(start: Column, end: Column, asOf: Column): Column = {
    val s = parseIsoDate(start)
    val e = parseIsoDate(end)
    (trim(coalesce(start, lit(""))) === "" || s <= asOf) &&
      (trim(coalesce(end, lit(""))) === "" || e >= asOf) &&
      // unparsable non-blank bound ⇒ false
      !(trim(coalesce(start, lit(""))) =!= "" && s.isNull) &&
      !(trim(coalesce(end, lit(""))) =!= "" && e.isNull)
  }

  /** Percentage with zero-denominator guard, 2dp
    * (reference: table_gold_member_activity_yearly.py:240-245).
    */
  def pct(num: Column, den: Column, scale: Int = 2): Column =
    when(den > 0, round(num.cast("double") / den.cast("double") * 100.0, scale))
      .otherwise(lit(0.0))

  /** Whitespace word count (reference: table_speeches.py:255-256). */
  def wordCount(c: Column): Column =
    when(trim(c) === "", lit(0)).otherwise(size(split(trim(c), "\\s+")))

  /** Regex token count: words OR single non-space punctuation — a
    * BPE-ish proxy for LLM token counting.
    */
  def tokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** URL normalization: relative paths absolutized against a base
    * (reference: normalize.py:84-93).
    */
  def normalizeUrl(c: Column, base: String): Column =
    when(c.isNull || trim(c) === "", lit(null))
      .when(c.startsWith("http://") || c.startsWith("https://"), c)
      .when(c.startsWith("/"), concat(lit(base), c))
      .otherwise(concat(lit(base + "/"), c))

  /** Safe slug for path components (reference: table_speeches.py:286-288):
    * lowercase, non-alphanumerics collapsed to single '-'.
    */
  def slug(c: Column): Column =
    regexp_replace(regexp_replace(lower(trim(c)), "[^a-z0-9]+", "-"), "(^-)|(-$)", "")

  /** Snake-case identifier fold (ASCII part of reference normalize.py:28-36;
    * NFKD accent folding lives in [[Udfs.snakeCaseUdf]]).
    */
  def snakeCaseAscii(c: Column): Column =
    regexp_replace(regexp_replace(lower(trim(c)), "[^a-z0-9]+", "_"), "(^_)|(_$)", "")

  /** The reference's non-ISO week id (ridiculous_sentences_weekly.py:173-202):
    * weeks start on the first Monday of the year; days before it belong to
    * week 1 of the PREVIOUS year's numbering continued — the reference
    * assigns them week 0 of the current year, clamped to week 1. Week id is
    * yyyy * 100 + week#, where week# = 1 + floor((date - firstMonday)/7),
    * and dates before firstMonday get week 1 of the prior year's last week
    * id... Reference semantics: dates before the first Monday roll into the
    * previous year's final week. Implemented as a pure column expression.
    */
  def weekId(d: Column): Column = {
    def firstMonday(yearCol: Column): Column = {
      val jan1 = make_date(yearCol, lit(1), lit(1))
      // dayofweek: Sunday=1 ... Monday=2. Days to add to reach Monday:
      val offset = pmod(lit(9) - dayofweek(jan1), lit(7))
      date_add(jan1, offset)
    }
    val y = year(d)
    val fmThis = firstMonday(y)
    val beforeFm = d < fmThis
    val effYear = when(beforeFm, y - 1).otherwise(y)
    val fm = when(beforeFm, firstMonday(y - 1)).otherwise(fmThis)
    val weekNum = floor(datediff(d, fm) / 7) + 1
    (effYear.cast("long") * 100 + weekNum).cast("long")
  }

  /** Previous-completed-week target date (reference:
    * ridiculous_sentences_weekly.py:196-202): Sundays report their own
    * week; any other day steps back to the most recent Sunday.
    */
  def prevCompletedWeekTarget(d: Column): Column = {
    val pyWeekday = pmod(dayofweek(d) + lit(5), lit(7)) // Mon=0..Sun=6
    when(pyWeekday === 6, d).otherwise(date_sub(d, pyWeekday + lit(1)))
  }

  /** Period bounds (reference: table_gold_content_fact_pool.py:209-216). */
  def yearStart(d: Column): Column = trunc(d, "year")
  def yearEnd(d: Column): Column = date_sub(add_months(trunc(d, "year"), 12), 1)
  def monthStart(d: Column): Column = trunc(d, "month")
  def monthEnd(d: Column): Column = last_day(d)

  /** Irish vote-label canonicalization (reference:
    * table_gold_member_activity_yearly.py:229-237): exact token list kept
    * for parity — Tá/Níl/Staon in any casing/accent form the API emits.
    */
  def voteKind(label: Column): Column = {
    val l = lower(trim(label))
    when(l.isin("tá", "ta", "yes", "aye"), "ta")
      .when(l.isin("níl", "nil", "no"), "nil")
      .when(l.isin("staon", "abstain"), "staon")
      .otherwise("other")
  }
}
