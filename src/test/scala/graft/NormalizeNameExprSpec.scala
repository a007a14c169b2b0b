package graft

import org.apache.spark.sql.functions._

import graft.functions.{NormalizeNameExpr, Udfs}

/** Native-Expression normalize_name: SQL registration, codegen execution,
  * and equivalence with the UDF kernel.
  */
class NormalizeNameExprSpec extends SparkSpec {
  import spark.implicits._

  test("expression matches the UDF on accents, case, whitespace, null") {
    NormalizeNameExpr.register(spark)
    val df = Seq("  Seán   Ó Fearghaíl ", "ALICE  SMITH", "", null)
      .toDF("name")
      .withColumn("via_expr", NormalizeNameExpr.normalizeName($"name"))
      .withColumn("via_udf", Udfs.normalizeName($"name"))
    val rows = df.collect()
    rows.foreach { r =>
      val (e, u) = (r.getAs[String]("via_expr"), r.getAs[String]("via_udf"))
      if (r.isNullAt(0)) assert(e == null) // expression is null-intolerant; UDF maps null→""
      else assert(e == u)
    }
    assert(rows(0).getAs[String]("via_expr") == "sean o fearghail")
  }

  test("expression works through SQL and inside a join key") {
    NormalizeNameExpr.register(spark)
    spark.createDataset(Seq(("m1", "Seán Ó Fearghaíl"), ("m2", "Mary   Lou")))
      .toDF("code", "name").createOrReplaceTempView("roster_raw")
    val out = spark.sql(
      """SELECT code, normalize_name(name) AS k FROM roster_raw ORDER BY code""")
      .as[(String, String)].collect().toSeq
    assert(out == Seq(("m1", "sean o fearghail"), ("m2", "mary lou")))

    // codegen path: a parquet-backed scan (not constant-foldable) must run
    // the expression inside a WholeStageCodegen span and produce values
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(NormalizeNameExpr.normalizeName($"lang").as("k"))
    // "*(n)" prefixes mark whole-stage-codegen stages in the compact plan
    assert(docs.queryExecution.executedPlan.toString.contains("*(1) Project [normalize_name"))
    assert(docs.distinct().as[String].collect().sorted.toSeq ==
      Seq("de", "en", "es", "fr", "zh"))
  }
}
