package graft

import org.apache.spark.sql.execution.FormattedMode

/** Debug helper: print the formatted physical plan of named queries.
  * Usage: tools/run.sh graft.ShowPlanMain q65_contamination_check ...
  */
object ShowPlanMain {
  def main(args: Array[String]): Unit = {
    val b = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    args.foreach { q =>
      println(s"===== $q")
      println(SparkEntry.queries(q)(s, "/root/testdata/sf0.001")
        .queryExecution.explainString(FormattedMode))
    }
    s.stop()
  }
}
