package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.RankOps

/** denseRankTopK must equal dense_rank-then-filter row-for-row, including
  * tie groups that widen the top-k beyond k rows.
  */
class RankOpsSpec extends SparkSpec {
  import spark.implicits._

  test("denseRankTopK == dense_rank filter on tied data") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 500).map { i =>
      val part = s"p${i % 4}"
      // heavy collisions so tie groups exist
      val v = (rng.nextInt(12) * 10).toLong
      (part, i.toLong, v)
    }
    val df = rows.toDF("part", "id", "value")

    val expected = df.withColumn("rk",
        dense_rank().over(Window.partitionBy("part").orderBy(col("value").desc)).cast("long"))
      .filter(col("rk") <= 3)
      .select("part", "id", "value", "rk")

    val actual = RankOps.denseRankTopK(df, Seq("part"), col("value"), k = 3, rankCol = "rk")
      .select("part", "id", "value", "rk")

    val e = expected.orderBy("part", "rk", "id").collect().toSeq
    val a = actual.orderBy("part", "rk", "id").collect().toSeq
    assert(a == e)
    // ties: a rank can carry many rows; every row of a tied value keeps it
    assert(a.nonEmpty && a.size >= 12)
  }

  test("fewer distinct values than k returns all ranks") {
    val df = Seq(("a", 1L, 5L), ("a", 2L, 5L), ("a", 3L, 1L)).toDF("part", "id", "value")
    val out = RankOps.denseRankTopK(df, Seq("part"), col("value"), k = 10, rankCol = "rk")
      .orderBy("id").collect()
    assert(out.map(_.getAs[Long]("rk")).toSeq == Seq(1L, 1L, 2L))
  }
}
