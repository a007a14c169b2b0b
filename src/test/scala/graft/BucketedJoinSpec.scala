package graft

import org.apache.spark.sql.functions._

/** Bucketing as the co-located-join strategy (SURVEY §4 / the 100 TB
  * partitioning story): two tables bucketed on the join key with the
  * same bucket count join WITHOUT a shuffle exchange on either side —
  * the layout a recurring fact-fact join should persist at scale
  * instead of re-shuffling per query.
  */
class BucketedJoinSpec extends SparkSpec {

  test("same-bucket-count tables sort-merge join with zero exchanges") {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    try {
      // force the shuffle-join path: broadcast would hide the exchange
      // question entirely for dims this small
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("b_orders")
      customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("b_customer")

      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
        .select("o_custkey", "c_mktsegment")
      joined.collect()
      // final adaptive plan only (the Initial Plan echo would re-match)
      val p = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(p.contains("SortMergeJoin"), p.take(800))
      assert(p.contains("Bucketed: true"), p.take(800))
      // the join reads the bucketed layout directly — no shuffle exchange
      // anywhere below it on either side
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${p.take(1200)}")

      // and the result matches the plain (shuffled) join
      val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment").collect().map(r => (r.getString(0), r.getLong(1)))
      val bucketed = joined.groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment").collect().map(r => (r.getString(0), r.getLong(1)))
      assert(bucketed.toSeq == plain.toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
