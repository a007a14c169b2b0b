package graft
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { q =>
      val reps = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache(); spark.sharedState.cacheManager.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $q min=${reps.min}%6.2f reps=" + reps.map(t => f"$t%5.2f").mkString(" "))
    }
    spark.stop()
  }
}
