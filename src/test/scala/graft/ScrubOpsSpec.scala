package graft

import org.apache.spark.sql.functions._

import graft.operators.ScrubOps

/** PII redaction and line-level boilerplate removal. */
class ScrubOpsSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii counts and replaces emails, phones, and IPv4s") {
    val docs = Seq(
      (1L, "mail a@b.org and c.d+e@f-g.co now"),
      (2L, "call 555-123-4567 or 555 1234 5678 at 192.168.0.1"),
      (3L, "plain text, nothing to scrub"),
      (4L, "")).toDF("doc_id", "text")
    val out = ScrubOps.redactPii(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out(0) == ((1L, 2L, 0L, 0L, "mail <EMAIL> and <EMAIL> now")))
    assert(out(1) == ((2L, 0L, 2L, 1L, "call <PHONE> or <PHONE> at <IP>")))
    assert(out(2) == ((3L, 0L, 0L, 0L, "plain text, nothing to scrub")))
    assert(out(3) == ((4L, 0L, 0L, 0L, "")))
  }

  test("spanDedup removes corpus-duplicated spans from every covered position") {
    // 3-word spans; the shared run "one two three four" (two 3-spans)
    // appears in docs 1 and 2 -> all four positions covered in both;
    // doc 3 is unique; doc 4 too short for any span
    val docs = Seq(
      (1L, "one two three four alpha beta gamma"),
      (2L, "prefix one two three four suffix"),
      (3L, "totally unique words here nothing shared at all"),
      (4L, "tiny doc")).toDF("doc_id", "text")
    val out = ScrubOps.spanDedup(docs, "text", "doc_id", spanWords = 3, minCount = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((1L, 7L, 4L, "alpha beta gamma")))
    assert(out(1) == ((2L, 6L, 4L, "prefix suffix")))
    assert(out(2) == ((3L, 8L, 0L, "totally unique words here nothing shared at all")))
    assert(out(3) == ((4L, 2L, 0L, "tiny doc")))
  }

  test("spanDedup counts within-doc repeats toward the duplication threshold") {
    val docs = Seq(
      (1L, "spam spam spam spam ok"),
      (2L, "clean words only")).toDF("doc_id", "text")
    // "spam spam spam" occurs twice WITHIN doc 1 -> covered positions 0-3
    val out = ScrubOps.spanDedup(docs, "text", "doc_id", spanWords = 3, minCount = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((1L, 5L, 4L, "ok")))
    assert(out(1) == ((2L, 3L, 0L, "clean words only")))
  }

  test("lineFrequencyFilter drops cross-corpus frequent lines, keeps order") {
    val boiler = "accept our cookies"
    val docs = Seq(
      (1L, s"alpha one\n$boiler\nalpha two"),
      (2L, s"$boiler\nbeta only"),
      (3L, s"gamma\n$boiler"),
      (4L, boiler), // every line boilerplate -> empty survivor
      (5L, "delta\ndelta")) // in-doc repeat counts as ONE doc, stays
      .toDF("doc_id", "text")
    val out = ScrubOps.lineFrequencyFilter(docs, "text", "doc_id", minDocs = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((1L, 3L, 2L, "alpha one\nalpha two")))
    assert(out(1) == ((2L, 2L, 1L, "beta only")))
    assert(out(2) == ((3L, 2L, 1L, "gamma")))
    assert(out(3) == ((4L, 1L, 0L, "")))
    assert(out(4) == ((5L, 2L, 2L, "delta\ndelta")))
  }
}
