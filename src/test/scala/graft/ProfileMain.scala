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
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"PROFILE $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    // warmup
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    time("q48:full-1")(SparkEntry.queries("q48_bill_stages_flatten")(spark, sfDir))
    time("q48:full-2")(SparkEntry.queries("q48_bill_stages_flatten")(spark, sfDir))
    time("q48:full-3")(SparkEntry.queries("q48_bill_stages_flatten")(spark, sfDir))
    time("q28:full-1")(SparkEntry.queries("q28_neardup_minhash")(spark, sfDir))
    time("q28:full-2")(SparkEntry.queries("q28_neardup_minhash")(spark, sfDir))

    spark.stop()
  }
}
