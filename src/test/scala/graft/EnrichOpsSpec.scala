package graft

import org.apache.spark.sql.functions._

import graft.operators.EnrichOps
import graft.operators.EnrichOps.{EnrichConfig, StubModelClient}

/** LLM-harness tests with deterministic stub clients (no network), mirroring
  * the reference runner semantics: render/validate/repair, closed-set
  * canonicalization, resume-from-existing, strict echo-back batch scoring
  * with repair + bisection.
  */
class EnrichOpsSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = EnrichConfig(
    idCol = "id", varCols = Seq("name"), outputCol = "summary",
    promptTemplate = "Summarize {name}", maxRetries = 2, maxWords = 3)

  test("enrichRows renders prompts, cleans and clamps output") {
    val df = Seq(("i1", "Alpha"), ("i2", "Beta")).toDF("id", "name")
    val out = EnrichOps.enrichRows(df, cfg.copy(stripCitations = true),
      () => new StubModelClient(p => s"resp [1] to   $p extra words beyond"))
      .select("id", "summary").as[(String, String)].collect().toMap
    assert(out("i1") == "resp to Summarize")     // citation stripped, 3-word clamp
  }

  test("enrichRows repair retry recovers; persistent invalidity yields null") {
    val df = Seq(("i1", "Alpha")).toDF("id", "name")
    // stub answers "ok" only to repair prompts → first call invalid, repair passes
    val repaired = EnrichOps.enrichRows(df,
      cfg.copy(regexMustMatch = Some("^ok$"), maxWords = 0, maxRetries = 3),
      () => new StubModelClient(p => if (p.contains("previous output was invalid")) "ok" else "nope"))
      .select("summary").as[String].collect()
    assert(repaired.head == "ok")
    val failed = EnrichOps.enrichRows(df,
      cfg.copy(regexMustMatch = Some("^ok$"), maxWords = 0, maxRetries = 3),
      () => new StubModelClient(_ => "nope"))
      .select("summary").as[String].collect()
    assert(failed.head == null)
  }

  test("classifyRows canonicalizes into the closed label set") {
    val labels = Seq("Health", "Housing", "Education")
    val df = Seq(("i1", "a"), ("i2", "b"), ("i3", "c")).toDF("id", "name")
    val responses = Map(
      "Summarize a" -> "health",                 // exact (case-insensitive)
      "Summarize b" -> "It is about Housing policy", // containment
      "Summarize c" -> "economy")                // no match → fallback
    val out = EnrichOps.classifyRows(df, cfg.copy(maxWords = 0), labels, "NONE",
      () => new StubModelClient(p => responses(p)))
      .select("id", "summary").as[(String, String)].collect().toMap
    assert(out == Map("i1" -> "Health", "i2" -> "Housing", "i3" -> "NONE"))
  }

  test("enrichResumable only calls the model for missing outputs") {
    val input = Seq(("i1", "Alpha"), ("i2", "Beta"), ("i3", "Gamma")).toDF("id", "name")
    val existing = Seq(("i1", "prior")).toDF("id", "summary")
    val counter = new java.util.concurrent.atomic.AtomicInteger()
    // NOTE: accumulator-free call counting only works in local mode; the
    // assertion on outputs is the portable one.
    val out = EnrichOps.enrichResumable(input, existing, cfg.copy(maxWords = 0),
      () => new StubModelClient(p => s"new:${p.stripPrefix("Summarize ")}"))
      .select("id", "summary").as[(String, String)].collect().toMap
    assert(out == Map("i1" -> "prior", "i2" -> "new:Beta", "i3" -> "new:Gamma"))
  }

  test("scoreBatches validates echo-back, clamps, repairs") {
    val df = Seq(("w1", "c1", "s1"), ("w1", "c2", "s2"), ("w2", "c3", "s3"))
      .toDF("week", "cid", "sentence")
    val stub = () => new StubModelClient({ p =>
      // extract candidate ids from the prompt payload and echo scores; c2
      // gets 250 (clamped to 100)
      val ids = "\"candidate_id\":\"(c\\d+)\"".r.findAllMatchIn(p).map(_.group(1)).toSeq
      ids.map(id => s"""{"candidate_id":"$id","score":${if (id == "c2") 250 else 42}}""")
        .mkString("[", ",", "]")
    })
    val out = EnrichOps.scoreBatches(df, "week", "cid", "sentence",
        batchSize = 10, maxRetries = 2, stub)
      .as[(String, String, Option[Long])].collect()
      .map(t => t._2 -> t._3).toMap
    assert(out == Map("c1" -> Some(42L), "c2" -> Some(100L), "c3" -> Some(42L)))
  }

  test("scoreBatches bisects failing batches and nulls unrecoverable items") {
    val df = Seq(("w1", "c1", "s1"), ("w1", "c2", "s2")).toDF("week", "cid", "sentence")
    // stub refuses to score c2 (omits it) → full batch fails echo-back →
    // bisection isolates c1 (scored) and c2 (null after retries)
    val stub = () => new StubModelClient({ p =>
      val ids = "\"candidate_id\":\"(c\\d+)\"".r.findAllMatchIn(p).map(_.group(1)).toSeq
      ids.filterNot(_ == "c2").map(id => s"""{"candidate_id":"$id","score":7}""")
        .mkString("[", ",", "]")
    })
    val out = EnrichOps.scoreBatches(df, "week", "cid", "sentence",
        batchSize = 10, maxRetries = 2, stub)
      .as[(String, String, Option[Long])].collect()
      .map(t => t._2 -> t._3).toMap
    assert(out == Map("c1" -> Some(7L), "c2" -> None))
  }

  test("parseScores accepts fenced/wrapped JSON and a scores envelope") {
    val fenced = "```json\n[{\"candidate_id\":\"a\",\"score\":5}]\n```"
    assert(EnrichOps.parseScores(fenced, Seq("a")) == Map("a" -> 5L))
    val envelope = """{"scores":[{"candidate_id":"a","score":1}]}"""
    assert(EnrichOps.parseScores(envelope, Seq("a")) == Map("a" -> 1L))
    intercept[IllegalArgumentException](
      EnrichOps.parseScores("""[{"candidate_id":"a","score":1}]""", Seq("a", "b")))
  }
}
