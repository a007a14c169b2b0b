package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Reader/writer conventions (SURVEY §2.1 S5-S8, M4; reference io_s3.py):
  * header CSV (optional UTF-8 BOM for spreadsheet consumers), snappy
  * parquet, all-string CSV ingestion, and staged read-modify-write for
  * mutable "latest" outputs.
  */
object TableIO {

  /** All-string CSV read (reference dtype=str, keep_default_na=False:
    * missing → empty string, not null). BOM handled natively by Spark.
    */
  def readCsvAllString(spark: SparkSession, path: String, columns: Seq[String]): DataFrame = {
    val schema = StructType(columns.map(c => StructField(c, StringType, nullable = true)))
    val df = spark.read.option("header", "true").schema(schema).csv(path)
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    df.select(columns.map(c => coalesce(col(c), lit("")).as(c)): _*)
  }

  /** Single-file header CSV, optionally with a UTF-8 BOM prepended
    * (reference utf-8-sig for Excel consumers). Spark writes a part file
    * into a staging dir; we move/rewrite it to the exact target path.
    */
  def writeCsv(df: DataFrame, target: String, bom: Boolean = false): Unit = {
    val spark = df.sparkSession
    val fs = FileSystem.get(new java.net.URI(target).resolve("/"),
      spark.sparkContext.hadoopConfiguration)
    val staging = new Path(target + ".staging")
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(staging.toString)
    val part = fs.listStatus(staging).map(_.getPath)
      .find(p => p.getName.startsWith("part-") && p.getName.endsWith(".csv"))
      .getOrElse(throw new IllegalStateException(s"No csv part file under $staging"))
    val targetPath = new Path(target)
    fs.delete(targetPath, false)
    if (bom) {
      val out = fs.create(targetPath, true)
      val in = fs.open(part)
      try { out.write(Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte)); in.transferTo(out) }
      finally { in.close(); out.close() }
    } else {
      fs.rename(part, targetPath)
    }
    fs.delete(staging, true)
  }

  /** Snappy parquet write to an exact directory (Spark default codec). */
  def writeParquet(df: DataFrame, target: String): Unit =
    df.write.mode("overwrite").parquet(target)

  /** Column-name cleanup for CSV→parquet recodes (reference
    * process/debate_speeches_csv_to_parquet.py:35-60): lowercase,
    * whitespace/hyphen runs → underscore, every OTHER non-alphanumeric
    * dropped (not folded — "é" disappears, matching the reference's
    * ascii-only keep), underscores collapsed and trimmed, empty → col;
    * then collisions deduped by PROBING `_2`, `_3`, ... against every
    * name taken so far (so "name", "name_2", "name" yields name,
    * name_2, name_3 — a per-base counter would re-collide on name_2).
    */
  def cleanColumnNames(df: DataFrame): DataFrame = {
    def clean(name: String): String = {
      val s = name.trim.toLowerCase
        .replaceAll("[\\s\\-]+", "_")
        .replaceAll("[^a-z0-9_]", "")
        .replaceAll("_+", "_")
        .replaceAll("^_+|_+$", "")
      if (s.isEmpty) "col" else s
    }
    val seen = scala.collection.mutable.Set.empty[String]
    val renamed = df.columns.map { c =>
      val base = clean(c)
      val unique = (Iterator.single(base) ++
        Iterator.from(2).map(i => s"${base}_$i")).find(!seen.contains(_)).get
      seen += unique
      unique
    }
    df.toDF(renamed.toIndexedSeq: _*)
  }

  /** M8 scoped replace at the file layout: a hive-partitioned parquet
    * table where an overwrite rewrites ONLY the partitions present in
    * the incoming frame (dynamic partition overwrite), leaving every
    * other partition's files untouched. This is how a scoped
    * weekly/monthly refresh replaces its window inside a 100 TB table
    * without reading or rewriting the rest — the DataFrame-level
    * scoped-replace (MergeOps/q15) rebuilds the whole output; this
    * sink makes the same semantics O(changed partitions). Readers
    * prune on the partition column (`PartitionFilters` in the scan).
    */
  def writeParquetPartitioned(df: DataFrame, target: String,
                              partitionCols: Seq[String]): Unit =
    df.write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(target)

  /** M4 read-modify-write "latest" sink: read current target if present,
    * merge via the supplied policy, stage the result, atomically swap.
    */
  def mergeIntoLatest(spark: SparkSession, incoming: DataFrame, target: String)
                     (merge: (DataFrame, DataFrame) => DataFrame): Unit = {
    val fs = FileSystem.get(new java.net.URI(target).resolve("/"),
      spark.sparkContext.hadoopConfiguration)
    val existing =
      if (fs.exists(new Path(target))) spark.read.parquet(target)
      else incoming.limit(0)
    // staged write happens while `target` still exists, so the lazy plan
    // reading it stays valid; only then swap directories
    val merged = merge(existing, incoming)
    val staged = target + "_staged"
    merged.write.mode("overwrite").parquet(staged)
    fs.delete(new Path(target), true)
    fs.rename(new Path(staged), new Path(target))
  }

  /** Schema-evolution column drop over a stored CSV/Parquet pair
    * (reference process/delete_s3_column.py): rewrite each object without
    * the column; an object that lacks the column passes through
    * untouched. strict requires the column present in BOTH objects
    * (the reference's STRICT=1). Returns (csvDropped, parquetDropped).
    */
  def dropColumn(spark: SparkSession, csvPath: String, parquetPath: String,
                 column: String, strict: Boolean = false): (Boolean, Boolean) = {
    val csvDf = spark.read.option("header", "true")
      .option("multiLine", "true").option("escape", "\"").csv(csvPath)
    val pqDf = spark.read.parquet(parquetPath)
    val csvHas = csvDf.columns.contains(column)
    val pqHas = pqDf.columns.contains(column)
    if (strict && (!csvHas || !pqHas)) {
      val missing = Seq(if (!csvHas) Some("CSV") else None,
        if (!pqHas) Some("PARQUET") else None).flatten
      throw new IllegalStateException(
        s"STRICT: column '$column' not present in: ${missing.mkString(", ")}")
    }
    // staged rewrites: the lazy plans still read the originals while the
    // replacement is computed (same pattern as mergeIntoLatest)
    if (csvHas) writeCsv(csvDf.drop(column), csvPath, bom = true)
    if (pqHas) {
      val fs = FileSystem.get(new java.net.URI(parquetPath).resolve("/"),
        spark.sparkContext.hadoopConfiguration)
      val staged = parquetPath + "_staged"
      pqDf.drop(column).write.mode("overwrite").parquet(staged)
      fs.delete(new Path(parquetPath), true)
      fs.rename(new Path(staged), new Path(parquetPath))
    }
    (csvHas, pqHas)
  }

  /** S11 review bundle: sample csv + schema json + dq json per table. */
  def writeReviewBundle(df: DataFrame, dir: String, sampleRows: Int,
                        dq: Map[String, Any]): Unit = {
    val spark = df.sparkSession
    writeCsv(df.limit(sampleRows), s"$dir/sample.csv")
    val fs = FileSystem.get(new java.net.URI(dir).resolve("/"),
      spark.sparkContext.hadoopConfiguration)
    def put(key: String, value: Any): Unit = {
      val out = fs.create(new Path(key), true)
      try out.write(StableJson.write(value).getBytes("UTF-8")) finally out.close()
    }
    put(s"$dir/schema.json", Map(
      "columns" -> df.schema.fields.map(_.name).toSeq,
      "types" -> df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap))
    put(s"$dir/dq.json", dq)
  }
}
