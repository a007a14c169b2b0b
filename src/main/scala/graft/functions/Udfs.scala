package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** The few functions whose semantics need JVM code (NFKD folding,
  * canonical-JSON hashing). Deterministic, registered once; promote to
  * codegen Expressions only if bench shows UDF overhead.
  */
object Udfs {

  private def nfkdFold(s: String): String =
    Normalizer.normalize(s, Normalizer.Form.NFKD)
      .replaceAll("\\p{M}+", "")

  /** Fuzzy-join name key (reference: normalize.py:39-44): lowercase,
    * accent-fold, collapse internal whitespace.
    */
  val normalizeNameFn: String => String = { s =>
    if (s == null) ""
    else nfkdFold(s).toLowerCase.trim.replaceAll("\\s+", " ")
  }
  val normalizeName = udf(normalizeNameFn)

  /** snake_case with NFKD fold (reference: normalize.py:28-36). */
  val snakeCaseFn: String => String = { s =>
    if (s == null) ""
    else nfkdFold(s).toLowerCase
      .replaceAll("[^a-z0-9]+", "_")
      .replaceAll("^_+|_+$", "")
  }
  val snakeCase = udf(snakeCaseFn)

  /** Canonical JSON of a sorted key→value map then sha256 (reference:
    * normalize.py:68-70, 79-81): sorted keys, compact separators, values
    * stringified; byte-stable across runs.
    */
  def stableJson(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) =>
      "\"" + escape(k) + "\":" + (if (v == null) "null" else "\"" + escape(v) + "\"")
    }.mkString("{", ",", "}")

  private def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  val stableRecordHashFn: (Seq[String], Seq[String]) => String = { (keys, vals) =>
    val json = stableJson(keys.zip(vals).toMap)
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(json.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }
  val stableRecordHash = udf(stableRecordHashFn)

  private def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Reference stable_record_hash over an arbitrary nested payload
    * (normalize.py:79-81): canonical re-serialization (sorted keys,
    * compact separators) then sha256 prefix.
    */
  val canonicalRecordHashFn: (String, Int) => String = { (json, n) =>
    if (json == null) null
    else sha256Hex(graft.io.StableJson.write(graft.io.StableJson.parse(json))).take(n)
  }
  val canonicalRecordHash = udf(canonicalRecordHashFn)

  /** Reference stable_hash applied to a Mapping iterates its KEYS
    * (normalize.py:73-76 + dict iteration) — document-order keys, trimmed,
    * lowered, "|"-joined, sha256 prefix. Used for generated debate ids
    * (table_debate_records.py:165-166).
    */
  val jsonKeysHashFn: (String, Int) => String = { (json, n) =>
    if (json == null) null
    else {
      val joined = graft.io.StableJson.topLevelKeys(json)
        .map(k => Option(k).fold("")(_.trim).toLowerCase).mkString("|")
      sha256Hex(joined).take(n)
    }
  }
  val jsonKeysHash = udf(jsonKeysHashFn)

  def normalizeNameCol(c: Column): Column = normalizeName(c)
}
