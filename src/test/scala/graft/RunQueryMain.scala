package graft

/** Debug helper: run named queries against a testdata dir and print the
  * result. Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 tools/run.sh graft.RunQueryMain q67_corpus_pipeline
  */
object RunQueryMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val b = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    args.foreach { q =>
      println(s"===== $q")
      SparkEntry.queries(q)(s, sfDir).show(50, truncate = false)
    }
    s.stop()
  }
}
