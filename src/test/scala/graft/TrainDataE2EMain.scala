package graft

import org.apache.spark.sql.functions._

import graft.io.ShardExport
import graft.operators.{CurationPipeline, DedupOps, MixOps, SimilarityOps, SplitOps, TextOps}

/** The TRAINING-DATA pipeline, driven END TO END at bench scale in one
  * process (the RefreshE2EMain convention — a PERF.md transcript driver,
  * not a test): 6-stage curation (parquet-materialized, the corpus-scale
  * shape) → trained quality classifier + DSIR importance scores joined
  * onto the survivors → semantic dedup over the embedding modality →
  * leakage-safe train/val/test split (near-dup components co-locate) →
  * token-budgeted source mixing of the train split → sequence packing +
  * JSONL shard export. Every stage is an oracle-checked operator
  * (q77/q138/q137/q136/q140/q130-q133/q63); this run proves they
  * COMPOSE — shared conventions (doc_id keys, normalized text, exact
  * integer scores) survive stage boundaries — and prices each stage.
  */
object TrainDataE2EMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val builder = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft_traindata_e2e_").toString
    val timings = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def stage[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      val secs = (System.nanoTime() - t0) / 1e9
      timings += name -> secs
      println(f"TRAINDATA $name%-26s ${secs}%7.2f s")
      r
    }

    val docs = Tables.load(spark, sfDir, "documents")
    val emb = Tables.load(spark, sfDir, "embeddings")
    val isEval = col("doc_id") % 10 === 0

    // 1: curation — gate, exact dedup, line scrub, span dedup, near-dup
    // removal, decontamination; per-stage parquet + cache unpersist
    val curated = stage("curate:6-stage") {
      val c = CurationPipeline.curateFullToParquet(docs, "text", "doc_id",
        "lang", isEval, s"$root/curated")
      println(s"  curated survivors: ${c.count()}")
      c
    }

    // 2: trained quality filter — margins for every raw doc, joined
    // onto the survivors (models train on the FULL corpus: the filter
    // must see what curation dropped, or its raw prior shifts run-to-run)
    val classified = stage("score:classifier") {
      val m = TextOps.qualityClassifier(docs, "text", "doc_id", isEval, steps = 3)
      val joined = curated.join(m, Seq("doc_id"), "left")
      val pos = joined.filter(col("predicted_target")).count()
      println(s"  survivors scoring target-like: $pos")
      joined
    }

    // 3: DSIR importance — same feature space, generative ratios
    val scored = stage("score:dsir") {
      val s = TextOps.dsirScores(docs, "text", "doc_id", isEval)
      val joined = classified.join(
        s.select(col("doc_id"), col("dsir_score")), Seq("doc_id"), "left")
      joined.write.mode("overwrite").parquet(s"$root/scored")
      spark.read.parquet(s"$root/scored")
    }

    // 4: semantic dedup over the embedding modality (q136 shape)
    stage("dedup:semantic-emb") {
      val verdicts = SimilarityOps.semanticDedup(
        emb.select(col("vec_id"), col("embedding")), "vec_id", "embedding",
        k = 8, maxIter = 2, t2 = 0.81)
      val dropped = verdicts.filter(!col("kept")).count()
      println(s"  embedding near-dups dropped: $dropped")
    }

    // 5: leakage-safe split over the survivors (pairs re-derived on the
    // CURATED text: post-dedup survivors should yield few/no pairs, and
    // whatever remains must co-locate)
    val splitDf = stage("split:leakage-safe") {
      val pairs = DedupOps.minhashNearDupPairs(scored, "_t", "doc_id",
        n = 3, numHashes = 64, bands = 32, threshold = 0.5,
        maxBucket = DedupOps.DefaultMaxBucket)
      val sp = SplitOps.leakageSafeSplit(scored, "doc_id", pairs, "doc_a", "doc_b")
      val bySplit = sp.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      println(s"  split sizes: $bySplit")
      scored.join(sp.select("doc_id", "split"), Seq("doc_id"))
    }

    // 6: token-budgeted source mixing of the train split (fractional
    // weights, the q133 recipe)
    val mixed = stage("mix:token-budget") {
      val train = splitDf.filter(col("split") === "train")
        .join(docs.select(col("doc_id").cast("long").as("doc_id"), col("source")), Seq("doc_id"))
      val w = (expr("CAST(substring(source, 4) AS INT)") % 4 + 1).cast("double") / lit(4.0)
      val m = MixOps.mixByTokenBudget(train, "source", "_t", "doc_id", w, budgetFrac = 0.5)
      println(s"  mixed train docs: ${m.count()}")
      m
    }

    // 7: sequence packing + JSONL shard export of the mixed train set
    stage("export:pack-shards") {
      val withToks = mixed.select(col("doc_id"), col("_t").as("text"),
        size(split(col("_t"), " ")).cast("long").as("tokens"))
      val sharded = ShardExport.assignShards(withToks, "tokens", "doc_id",
        numShards = 8, capacity = 4096L)
      ShardExport.writeJsonlShards(sharded, s"$root/shards")
      val files = new java.io.File(s"$root/shards").listFiles()
      println(s"  shard partitions written: ${if (files == null) 0 else files.count(_.isDirectory)}")
    }

    println("TRAINDATA total " + f"${timings.map(_._2).sum}%7.2f s  (root: $root)")
    spark.stop()
  }
}
