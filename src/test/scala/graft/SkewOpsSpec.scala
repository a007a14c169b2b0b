package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewOps

/** Skew mitigation: salted aggregation and salted join must be exactly
  * equivalent to their unsalted forms — salting changes the shuffle
  * layout, never the result.
  */
class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one hot key
  private lazy val skewed = (1 to 2000).map { i =>
    (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toDouble)
  }.toDF("k", "v")

  private lazy val dim = Seq(("hot", "H"), ("k0", "A"), ("k3", "B"), ("k6", "C"))
    .toDF("k", "label")

  test("saltedCountSum equals the plain groupBy on a skewed key") {
    val salted = SkewOps.saltedCountSum(skewed, Seq("k"), col("v"), buckets = 16)
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val plain = skewed.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("t"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedJoin inner equals the plain inner join") {
    val salted = SkewOps.saltedJoin(skewed, dim, Seq("k"), buckets = 8)
      .groupBy("k", "label").agg(count(lit(1)).as("n"), sum("v").as("t"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val plain = skewed.join(dim, Seq("k"))
      .groupBy("k", "label").agg(count(lit(1)).as("n"), sum("v").as("t"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(salted.toSeq == plain.toSeq)
    assert(salted.exists(_._1 == "hot"))
  }

  test("saltedJoin left keeps unmatched big-side rows exactly once") {
    val salted = SkewOps.saltedJoin(skewed, dim, Seq("k"), buckets = 8, joinType = "left")
    val plain = skewed.join(dim, Seq("k"), "left")
    assert(salted.count() == plain.count())
    // unmatched keys (no dim row) survive with null label
    val unmatched = salted.filter(col("label").isNull)
      .select("k").distinct().collect().map(_.getString(0)).sorted
    val plainUnmatched = plain.filter(col("label").isNull)
      .select("k").distinct().collect().map(_.getString(0)).sorted
    assert(unmatched.toSeq == plainUnmatched.toSeq && unmatched.nonEmpty)
  }

  test("saltedJoin rejects right/full join types") {
    intercept[IllegalArgumentException] {
      SkewOps.saltedJoin(skewed, dim, Seq("k"), 8, joinType = "full")
    }
  }
}
