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
    * before this doc / capacity) in deterministic orderCol order, then
    * renumbered densely per shard so bins are consecutive from 0 even
    * when a single doc exceeds `capacity` (a raw floor would skip the
    * indices its oversized doc jumped over — breaking the "sequential
    * bins" layout a trainer streams).
    * Capacity is a soft bound — the doc that crosses a boundary stays
    * in the bin where it started (exact bounds would split documents);
    * every bin except its shard's last is ≥ capacity-minus-one-doc
    * full. The shard key bounds the packing window's partition, so no
    * task ever sorts more than one shard.
    *
    * DETERMINISM CONTRACT: orderCol must be unique per shard (doc ids
    * are). With duplicate orderCol values the running sum's tie order —
    * and therefore the packing — would vary run to run; `tieBreakCols`
    * extends the window order for callers whose natural order carries
    * ties (e.g. (date, doc_id)).
    */
  def assignShards(df: DataFrame, tokensCol: String, orderCol: String,
                   numShards: Int, capacity: Long,
                   tieBreakCols: Seq[String] = Nil): DataFrame = {
    val order = (orderCol +: tieBreakCols).map(col)
    val w = Window.partitionBy("shard").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val dense = Window.partitionBy("shard").orderBy(col("_rawbin"))
    df.withColumn("shard", pmod(col(orderCol), lit(numShards.toLong)))
      .withColumn("_offset", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .withColumn("_rawbin", expr(s"_offset div ${capacity}L"))
      .withColumn("bin", dense_rank().over(dense).cast("long") - 1L)
      .drop("_offset", "_rawbin")
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
