package graft

import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, TextOps}

/** Repetition stats, global top-ngrams, and the decontamination report
  * on hand-computable fixtures.
  */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats counts words/bigrams and flags >30% duplicate words") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),       // 10 words, 0 dups → not repetitive
      (2L, "a a a a a a a b c d"),       // 10 words, 4 distinct → 6 dups → repetitive
      (3L, "x y x y x y"),               // 6 words, 2 distinct → 4 dups → repetitive
      (4L, "one"),                       // <2 words → dropped
      (5L, "u v u w")                    // 4 words, 3 distinct → 1 dup (25%) → not
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionStats(docs, "text", "doc_id")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(got.toSeq == Seq(
      (1L, 10L, 10L, 9L, 9L, false),
      (2L, 10L, 4L, 9L, 4L, true),   // bigrams: aa, ab, bc, cd distinct
      (3L, 6L, 2L, 5L, 2L, true),    // bigrams: xy, yx
      (5L, 4L, 3L, 3L, 3L, false)))  // uv, vu, uw
  }

  test("topNgrams returns count-desc gram-asc top-k with multiplicity") {
    val docs = Seq(
      (1L, "a b c a b c"),   // "a b c" x2 (overlapping: abc, bca, cab, abc)
      (2L, "a b c d")        // abc, bcd
    ).toDF("doc_id", "text")
    val got = TextOps.topNgrams(docs, "text", n = 3, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a b c", 3L), ("b c a", 1L), ("b c d", 1L)))
  }

  test("contaminationReport finds train docs sharing n-grams with eval docs") {
    val docs = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),     // eval (id%10==0)
      (11L, "yesterday the quick brown fox jumps over a fence"), // shares "the quick brown fox jumps"
      (12L, "a completely different document with no overlap at all"),
      (20L, "pack my box with five dozen liquor jugs today"),   // eval
      (21L, "please pack my box with five dozen liquor jugs now") // shares 2 5-grams w/ 20
    ).toDF("doc_id", "text")
    val got = DedupOps.contaminationReport(docs, "text", "doc_id",
        col("doc_id") % 10 === 0, n = 5)
      .orderBy("train_doc")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 11 shares "the quick brown fox jumps" + "quick brown fox jumps over"
    //   with 10;
    // 21 shares "pack my box with five" + "my box with five dozen" +
    //   "box with five dozen liquor" + "with five dozen liquor jugs" with 20
    assert(got.toSeq == Seq((11L, 1L, 2L), (21L, 1L, 4L)))
  }

  test("bigramSurprisal: repeated transitions score low, novel ones high; short docs drop") {
    // corpus: doc 1 repeats one transition ("a b") many times — the
    // model learns it, so doc 1's bigrams are UNsurprising; doc 2 takes
    // transitions seen nowhere else — every one is smoothing-only mass
    val docs = Seq(
      (1L, "a b a b a b a b a b"),
      (2L, "c d e f g h"),
      (3L, "a b a b"),   // same transitions as doc 1 → similar avg
      (4L, "one"),       // 1 token: no bigram → absent
      (5L, "")           // empty: absent
    ).toDF("doc_id", "text")
    val got = TextOps.bigramSurprisal(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L), s"short/empty docs must drop: $got")
    val byId = got.map(r => r._1 -> r).toMap
    // n_bigrams = tokens - 1
    assert(byId(1L)._3 == 9 && byId(2L)._3 == 5 && byId(3L)._3 == 3)
    // novel transitions are strictly more surprising than drilled ones
    assert(byId(2L)._4 > byId(1L)._4,
      s"novel-transition doc must out-score the repeated one: $got")
    // contributions are non-negative longs (the cross-engine div contract)
    assert(got.forall(_._2 >= 0), s"negative surprisal breaks div parity: $got")
    // determinism under repartition (exact integer pipeline end to end)
    val again = TextOps.bigramSurprisal(docs.repartition(5), "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(again.toSeq == got.toSeq)
  }

  test("bigramSurprisal under planted Zipf skew: salted fallback is bit-identical and splits the hot key") {
    // One gram ("of the") owns a third of ALL bigram occurrences — the
    // Zipf head the round-13 verdict flagged for q131's shuffle joins.
    // AQE's skew split cannot fire on this shape (the count side reuses
    // its aggregation exchange, so the join never matches the
    // two-shuffle-stage pattern OptimizeSkewedJoin rewrites), so
    // saltBuckets is the scale path: same scores, hot key spread.
    val docs = (0 until 600).map { i =>
      val f = (0 to 3).map(j => s"u${i}x$j")
      (i.toLong, s"${f(0)} of the ${f(1)} of the ${f(2)} of the ${f(3)}")
    }.toDF("doc_id", "text").repartition(8)

    def run(buckets: Int): Seq[(Long, Long, Long, Long)] =
      TextOps.bigramSurprisal(docs, "text", "doc_id", saltBuckets = buckets)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
    val plain = run(0)
    // fixture honesty: every doc contributes 9 bigrams, 3 of them the
    // hot gram — exactly a 1/3 occurrence share on one reducer key
    assert(plain.size == 600 && plain.forall(_._3 == 9), "Zipf fixture drifted")
    assert(run(8) == plain, "salting changed the surprisal scores")

    // the salted plan keys its joins on gram+salt / w1+salt — losing
    // the salt silently restores the hot-reducer shape
    val salted = TextOps.bigramSurprisal(docs, "text", "doc_id", saltBuckets = 8)
    salted.collect()
    val p = salted.queryExecution.executedPlan.toString
    assert(p.contains("_salt"), s"salted plan lost its salt keys:\n${p.take(1500)}")

    // and the salt genuinely SPREADS the hot family: the operator's
    // salting formula (hash of key + partition id) lands the constant
    // hot gram in more than one sub-key across the 8 input partitions
    val hotSalts = docs.select(lit("of the").as("gram"))
      .withColumn("s", pmod(xxhash64(col("gram"), spark_partition_id()), lit(8)))
      .select("s").distinct().count()
    assert(hotSalts > 1, "hot gram not spread across salt sub-keys")
  }
}
