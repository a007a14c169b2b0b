package graft

import org.apache.spark.sql.functions._
import graft.functions.{Fns, Udfs}

/** Golden tests for the scalar kernel — hash values pinned against the
  * reference implementation (normalize.py stable_hash/stable_record_hash
  * semantics, captured via python hashlib).
  */
class FnsSpec extends SparkSpec {
  import spark.implicits._

  test("stableHash matches reference sha256 lowered pipe-join prefix") {
    val got = Seq(("John Smith", "FF")).toDF("a", "b")
      .select(Fns.stableHash(16, col("a"), col("b"))).as[String].head()
    assert(got == "9d1d9d536c82669e")
    val got24 = Seq(("member/123", "2024-01-01")).toDF("a", "b")
      .select(Fns.stableHash(24, col("a"), col("b"))).as[String].head()
    assert(got24 == "7d2a462700f254149a005b01")
  }

  test("rowId24 matches reference sha256 double-pipe join prefix") {
    val got = Seq(("a", "b")).toDF("a", "b")
      .select(Fns.rowId24(col("a"), col("b"))).as[String].head()
    assert(got == "23360994fdaa608ee91c88e2")
  }

  test("stableRecordHash is key-order independent and matches python json.dumps") {
    val h = Udfs.stableRecordHashFn(Seq("b", "a"), Seq("2", "1"))
    assert(h == "21f76dfbfe6dfe21f762080ef484112cf2952974cef30741fd1931e1c6d92112")
    assert(Udfs.stableRecordHashFn(Seq("a", "b"), Seq("1", "2")) == h)
  }

  test("normalizeName folds accents, case, whitespace") {
    assert(Udfs.normalizeNameFn("  Seán   Ó Fearghaíl ") == "sean o fearghail")
    assert(Udfs.normalizeNameFn(null) == "")
  }

  test("snakeCase folds to identifier") {
    assert(Udfs.snakeCaseFn("Dáil Éireann — Vote #3") == "dail_eireann_vote_3")
  }

  test("parseIsoDate accepts iso prefix and 3 fallback formats") {
    val df = Seq("2024-03-05T10:00:00Z", "05/03/2024", "05-03-2024", "20240305", "garbage", "")
      .toDF("s").select(Fns.parseIsoDate(col("s")).cast("string"))
    assert(df.as[String].collect().toSeq ==
      Seq("2024-03-05", "2024-03-05", "2024-03-05", "2024-03-05", null, null))
  }

  test("isCurrentRange: open bounds, inclusive ends, future start false, unparsable false") {
    val asOf = to_date(lit("2024-06-01"))
    val df = Seq(
      ("2024-01-01", "2024-12-31"), // inside → true
      ("", ""),                     // fully open → true
      ("2024-06-01", "2024-06-01"), // boundary inclusive → true
      ("2024-07-01", ""),           // future start → false
      ("2024-01-01", "2024-05-31"), // ended → false
      ("not-a-date", "")            // unparsable → false
    ).toDF("s", "e").select(Fns.isCurrentRange(col("s"), col("e"), asOf))
    assert(df.as[Boolean].collect().toSeq ==
      Seq(true, true, true, false, false, false))
  }

  test("weekId: first-Monday calendar, pre-first-Monday rolls to previous year") {
    val df = Seq("2024-01-01", "2024-01-07", "2024-01-08", "2025-01-01", "2025-01-06", "2025-12-29")
      .toDF("d").select(Fns.weekId(to_date(col("d"))))
    // 2024-01-01 is a Monday → week 1; 2024-01-07 still week 1; 01-08 week 2.
    // 2025 first Monday is Jan 6 → Jan 1 2025 belongs to 2024's last week (202453).
    assert(df.as[Long].collect().toSeq ==
      Seq(202401L, 202401L, 202402L, 202453L, 202501L, 202552L))
  }

  test("voteKind canonicalizes Irish labels") {
    val df = Seq("Tá", "NÍL", "Staon", "absent").toDF("l").select(Fns.voteKind(col("l")))
    assert(df.as[String].collect().toSeq == Seq("ta", "nil", "staon", "other"))
  }

  test("truthy accepts the reference token set only") {
    val df = Seq("true", "1", "YES", " y ", "no", "", "0").toDF("s").select(Fns.truthy(col("s")))
    assert(df.as[Boolean].collect().toSeq == Seq(true, true, true, true, false, false, false))
  }

  test("normalizeUrl absolutizes relative paths against the base (F8)") {
    val df = Seq("https://x.ie/a", "/akn/doc.xml", "akn/doc.xml", "").toDF("u")
      .select(Fns.normalizeUrl(col("u"), "https://data.oireachtas.ie"))
    assert(df.as[String].collect().toSeq == Seq(
      "https://x.ie/a",
      "https://data.oireachtas.ie/akn/doc.xml",
      "https://data.oireachtas.ie/akn/doc.xml",
      null))
  }

  test("slug folds to safe path components (F9)") {
    val df = Seq("Dáil debate #3 / 2024!").toDF("s").select(Fns.slug(col("s")))
    assert(df.as[String].collect().head == "d-il-debate-3-2024")
  }

  test("pct guards zero denominator and rounds to 2dp") {
    val df = Seq((1, 3), (0, 0)).toDF("n", "d").select(Fns.pct(col("n"), col("d")))
    assert(df.as[Double].collect().toSeq == Seq(33.33, 0.0))
  }
}
