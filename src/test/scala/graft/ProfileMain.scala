package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway stage-level profiler for the bench tail (not a test). */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => DataFrame): Unit = {
      // warm + best-of-2, mirroring Bench
      f.write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $name%-40s ${ts.min}%8.2f s")
    }

    import graft.operators.DedupOps
    val docs = Tables.load(spark, sfDir, "documents")
    val sh = docs.select(col("doc_id").cast("long").as("doc_id"),
      DedupOps.shingles(col("text"), 3).as("sg")).filter(size(col("sg")) > 0)
    time("q28:shingles-only")(sh)
    val sig = DedupOps.minhashSignaturesFromShingles(sh, 64)
    time("q28:signatures")(sig)
    time("q28:candidates")(DedupOps.lshCandidatePairs(sig, 32, 2))
    time("q28:full")(SparkEntry.queries("q28_neardup_minhash")(spark, sfDir))
    time("q28:full-nocache") {
      DedupOps.minhashNearDupPairs(docs, "text", "doc_id", 3, 64, 32, 0.5,
        cacheShingles = false).orderBy("doc_a", "doc_b")
    }

    spark.stop()
  }
}
