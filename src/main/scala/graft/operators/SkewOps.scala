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
    *
    * The salt hashes the row's own columns plus its partition id —
    * deterministic under task retries (monotonically_increasing_id would
    * re-salt recomputed partitions differently; harmless for associative
    * aggregates but a silent corruption hazard if the pattern is copied
    * for non-associative state).
    */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: Column,
                     buckets: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(keys.map(col) :+ valueCol :+ spark_partition_id(): _*), lit(buckets)))
    val partial = salted.groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_n"), sum(valueCol).as("_s"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("_n")).as("n_rows"), sum(col("_s")).as("total"))
  }

  /** Salted equi-join for skewed keys: the big side's hot key is spread
    * over `buckets` sub-keys (deterministic salt, as above); the small
    * side replicates once per bucket so every (key, salt) pair still
    * matches. Join volume is unchanged — only the per-reducer ceiling
    * drops from |hot key| to |hot key|/buckets.
    *
    * Use when the small side is too large to broadcast but small enough
    * to replicate ×buckets (the gap AQE's skew-join handling doesn't
    * cover when a single key exceeds every split threshold). Inner and
    * left joins preserve semantics; right/full would need null-handling
    * on the replicated side, so they are not offered.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left, got $joinType")
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(keys.map(col) :+ spark_partition_id(): _*), lit(buckets)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(array((0 until buckets).map(lit): _*)))
    saltedBig.join(replicated, keys :+ "_salt", joinType).drop("_salt")
  }
}
