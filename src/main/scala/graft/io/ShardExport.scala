package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data shard export: deterministic token-bounded bin
  * assignment + a JSONL file tree partitioned by (shard, bin) — the
  * layout a trainer streams (one reader per shard, sequential bins).
  */
object ShardExport {

  /** Greedy token packing (the q63 kernel as a reusable operator):
    * shard = orderCol mod numShards, bin = floor(running token count
    * before this doc / capacity) in deterministic orderCol order.
    * Capacity is a soft bound — the doc that crosses a boundary stays
    * in the bin where it started (exact bounds would split documents);
    * every bin except its shard's last is ≥ capacity-minus-one-doc
    * full. The shard key bounds the packing window's partition, so no
    * task ever sorts more than one shard.
    */
  def assignShards(df: DataFrame, tokensCol: String, orderCol: String,
                   numShards: Int, capacity: Long): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard", pmod(col(orderCol), lit(numShards.toLong)))
      .withColumn("_offset", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .withColumn("bin", expr(s"_offset div ${capacity}L"))
      .drop("_offset")
  }

  /** Write one JSONL line per row under path/shard=S/bin=B/. All
    * non-partition columns serialize into the JSON object (struct field
    * order = column order, deterministic). One file per (shard, bin)
    * task; the repartition keys file layout to the shard so writers
    * scale with shard count, not executor count.
    */
  def writeJsonlShards(df: DataFrame, path: String): Unit = {
    val dataCols = df.columns.filterNot(Set("shard", "bin"))
    df.withColumn("value", to_json(struct(dataCols.map(col).toSeq: _*)))
      .repartition(col("shard"))
      .select(col("shard"), col("bin"), col("value"))
      .write.partitionBy("shard", "bin").mode("overwrite").text(path)
  }
}
