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

  test("a user _salt column survives salting untouched") {
    // both inputs already carry _salt; the operator must pick another
    // internal name instead of shadowing (and then dropping) user data
    val bigWithSalt = skewed.withColumn("_salt", lit("user-data"))
    val dimWithSalt = dim.withColumn("_salt", lit("dim-data"))
    val joined = SkewOps.saltedJoin(bigWithSalt, dimWithSalt.drop("_salt"), Seq("k"), 8)
    assert(joined.columns.count(_ == "_salt") == 1)
    assert(joined.select("_salt").distinct().collect().map(_.getString(0)).toSeq == Seq("user-data"))
    // dim-side _salt: suffix column also survives (joined on a fresh name)
    val joined2 = SkewOps.saltedJoin(bigWithSalt, dimWithSalt, Seq("k"), 8)
    assert(joined2.columns.sorted.count(_.startsWith("_salt")) == 2)

    val agged = SkewOps.saltedCountSum(bigWithSalt, Seq("k", "_salt"), col("v"), 16)
      .orderBy("k").collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val plain = bigWithSalt.groupBy("k", "_salt").agg(count(lit(1)).as("n"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(agged.toSeq == plain.toSeq)
  }
}
