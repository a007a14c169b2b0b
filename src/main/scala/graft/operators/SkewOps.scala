package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot group keys: two-stage salted aggregation.
  * A key with billions of rows would pin one reducer; salting spreads its
  * rows over `buckets` partial groups (combinable aggregates only), and a
  * cheap second stage merges the partials. AQE's skew handling covers
  * joins; this is the groupBy-side counterpart for the 100 TB path.
  */
object SkewOps {

  /** Salted count/sum aggregation equivalent to
    * df.groupBy(keys).agg(count(1), sum(valueCol)).
    */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: Column,
                     buckets: Int): DataFrame = {
    val salted = df.withColumn("_salt", pmod(xxhash64(valueCol, monotonically_increasing_id()), lit(buckets)))
    val partial = salted.groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_n"), sum(valueCol).as("_s"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("_n")).as("n_rows"), sum(col("_s")).as("total"))
  }
}
