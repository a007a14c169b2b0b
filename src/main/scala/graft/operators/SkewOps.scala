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

  /** First name in `_salt`, `_salt_1`, … not already a column of any
    * input — a fixed name could silently shadow (and then drop) user
    * data, or worse, key the join on the caller's own `_salt` column.
    */
  private def freshSaltCol(dfs: DataFrame*): String = {
    val taken = dfs.flatMap(_.columns).toSet
    Iterator.from(0)
      .map(i => if (i == 0) "_salt" else s"_salt_$i")
      .find(!taken(_)).get
  }

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
    val saltCol = freshSaltCol(df)
    val salted = df.withColumn(saltCol,
      pmod(xxhash64(keys.map(col) :+ valueCol :+ spark_partition_id(): _*), lit(buckets)))
    val partial = salted.groupBy((keys.map(col) :+ col(saltCol)): _*)
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
    val saltCol = freshSaltCol(big, small)
    val saltedBig = big.withColumn(saltCol,
      pmod(xxhash64(keys.map(col) :+ spark_partition_id(): _*), lit(buckets)).cast("int"))
    val replicated = small.withColumn(saltCol,
      explode(array((0 until buckets).map(lit): _*)))
    saltedBig.join(replicated, keys :+ saltCol, joinType).drop(saltCol)
  }
}
