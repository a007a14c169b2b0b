package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Scale-safe ranking (SURVEY §2.7 W1/W2). A dense_rank over a
  * low-cardinality window partition (e.g. PARTITION BY year) sorts every
  * row of the partition in ONE task — parallelism is bounded by the number
  * of partitions regardless of cluster size, and at 100× data each year
  * holds the full customer set. When only the top-k ranks are consumed,
  * dense-rank-then-filter is equivalent to "value ∈ top-k distinct values
  * of the partition", which IS computable scalably: a combinable aggregate
  * whose state is a bounded (≤ k) sorted set, merged map-side, then a
  * broadcast join of the tiny (partition → ranked values) table back onto
  * the rows. No full-partition sort ever happens.
  */
object RankOps {

  /** Bounded top-k-distinct aggregator over long-encoded values: state and
    * result are the at-most-k largest distinct values, descending. Exact
    * decimals ride through their unscaled long representation.
    */
  final class TopKDistinctLong(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    override def zero: Seq[Long] = Vector.empty
    override def reduce(b: Seq[Long], a: Long): Seq[Long] =
      if (b.contains(a)) b else (b :+ a).sortBy(-_).take(k)
    override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
      (b1 ++ b2).distinct.sortBy(-_).take(k)
    override def finish(reduction: Seq[Long]): Seq[Long] = reduction
    override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** dense_rank ≤ k per partition without a partition-wide sort:
    * returns df's rows whose valueCol is among the k largest distinct
    * values of their partition, with a 1-based `rankCol`.
    *
    * valueCol must be a LongType encoding that preserves order (cast
    * decimals via their unscaled representation before calling).
    */
  def denseRankTopK(df: DataFrame, partitionCols: Seq[String], valueCol: Column,
                    k: Int, rankCol: String): DataFrame = {
    val topk = udaf(new TopKDistinctLong(k))
    val keyed = df.withColumn("_rank_value", valueCol)
    val tops = keyed.groupBy(partitionCols.map(col): _*)
      .agg(topk(col("_rank_value")).as("_top_values"))
    val ranks = tops
      .select(partitionCols.map(col) :+ posexplode(col("_top_values")).as(Seq("_pos", "_rank_value")): _*)
      .withColumn(rankCol, (col("_pos") + 1).cast("long")).drop("_pos")
    keyed.join(broadcast(ranks), partitionCols :+ "_rank_value")
      .drop("_rank_value")
  }
}
