package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scan-side pruning for joins whose small side is too large to
  * broadcast as rows but whose KEY SET compresses into a sketch.
  */
object PruneOps {

  /** Bloom-pruned semi-join on long keys: build a Bloom filter over the
    * key side (one distributed pass, per-partition sketches merged),
    * broadcast it, and drop big-side rows that cannot match BEFORE the
    * shuffle; an exact left-semi join then removes the false positives,
    * so the result is exactly `big SEMI JOIN keys`.
    *
    * This is the manual form of Spark's runtime row-level filtering for
    * when the pruning side isn't a join Spark can infer: at 100 TB a 1%
    * fpp sketch over 10⁸ keys is ~120 MB broadcast vs shuffling the
    * un-pruned fact table. The filter is a deterministic function of the
    * sketch, so retries are safe; the UDF doesn't push into the parquet
    * scan (codegen boundary) but runs scan-side ahead of the exchange,
    * which is where the win is.
    */
  def bloomSemiJoin(big: DataFrame, keys: DataFrame,
                    bigKey: String, keyCol: String,
                    expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    // build and probe must hash IDENTICAL values: the sketch is built on
    // the key column cast to long and probed with the big key cast to
    // long. Non-integral keys are rejected up front — a string key would
    // otherwise hash differently on the two sides and silently prune
    // TRUE matches (false negatives the exact semi-join cannot restore).
    def requireIntegral(df: DataFrame, c: String): Unit = {
      val dt = df.schema(c).dataType
      require(Seq("byte", "short", "integer", "long").contains(dt.typeName),
        s"bloomSemiJoin requires an integral key column; '$c' is ${dt.typeName} — " +
          "hash a non-integral key to a long (xxhash64) on BOTH sides first")
    }
    requireIntegral(big, bigKey)
    requireIntegral(keys, keyCol)
    val bf = keys.select(col(keyCol).cast("long").as(keyCol))
      .stat.bloomFilter(keyCol, expectedItems, fpp)
    val bcast = big.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bcast.value.mightContainLong(k))
    big.filter(col(bigKey).isNotNull && mightContain(col(bigKey).cast("long")))
      .join(keys.select(col(keyCol).as(bigKey)).distinct(), Seq(bigKey), "left_semi")
  }
}
