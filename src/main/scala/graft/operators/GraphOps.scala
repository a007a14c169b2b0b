package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed graph helpers for the dedup surface. */
object GraphOps {

  /** Connected components by min-label propagation: every node starts
    * labeled with its own id; each round pushes labels across edges and
    * keeps the minimum; converged when no label decreases. Components
    * come out keyed by their smallest member id — the canonical keeper
    * for a transitive near-dup cluster (pairwise drop-the-larger-id
    * misses transitive chains: a~b, b~c must collapse to one keeper
    * even when a~c itself is below threshold).
    *
    * Each round is one distributed join + combinable min-aggregate;
    * rounds needed = graph diameter (near-dup clusters are shallow).
    * Labels persist per round and unpersist the previous round. At
    * 1000-executor scale, checkpoint every few rounds to truncate
    * lineage, or switch to the large-star/small-star variant whose
    * round count is O(log n) on pathological chains.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 50): DataFrame = {
    val edges = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
    val sym = edges
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val msgs = sym.join(labels, sym("src") === labels("node"))
        .select(col("dst").as("node"), col("label"))
      val updated = labels.unionByName(msgs)
        .groupBy("node").agg(min(col("label")).as("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = updated
        .join(labels.select(col("node"), col("label").as("_old")), "node")
        .filter(col("label") < col("_old")).count()
      labels.unpersist()
      labels = updated
      iter += 1
    }
    sym.unpersist()
    labels.select(col("node").as("doc_id"), col("label").as("component"))
  }
}
