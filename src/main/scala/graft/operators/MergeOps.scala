package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Write-semantics kernel (SURVEY §2.10, reference extract/oireachtas/
  * merge.py + history_dedupe.py). The reference relies on pandas' implicit
  * row order for keep-first/keep-last; Spark has none, so every operator
  * here takes (or synthesizes) an explicit ordering. At cluster scale the
  * caller should supply a real ingestion-sequence column; the synthesized
  * per-side order is only deterministic for single-file inputs.
  */
object MergeOps {

  private val SRC = "_graft_src"
  private val SEQ = "_graft_seq"
  private val RN = "_graft_rn"

  /** Tag each side with a priority + a within-side sequence so that
    * "concat order" (existing rows first, incoming last) is explicit.
    */
  private def tagged(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val e = existing.withColumn(SRC, lit(0)).withColumn(SEQ, monotonically_increasing_id())
    val i = incoming.withColumn(SRC, lit(1)).withColumn(SEQ, monotonically_increasing_id())
    e.unionByName(i)
  }

  private def keepLast(df: DataFrame, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(SRC).desc, col(SEQ).desc)
    df.withColumn(RN, row_number().over(w)).filter(col(RN) === 1).drop(RN)
  }

  /** M2 `upsert` (merge.py:14-30): concat(existing, incoming) →
    * drop_duplicates(pk, keep=last) so incoming wins → optional second
    * dedupe by business key (removes legacy duplicate surrogate ids,
    * tests/test_oireachtas_business_key_merge.py:12-70).
    */
  def upsert(existing: DataFrame, incoming: DataFrame, pk: Seq[String],
             businessKey: Seq[String] = Nil): DataFrame = {
    val byPk = keepLast(tagged(existing, incoming), pk)
    val out = if (businessKey.nonEmpty) keepLast(byPk, businessKey) else byPk
    out.drop(SRC, SEQ)
  }

  /** M1 `snapshot_replace` / `rebuild`: incoming replaces wholesale. */
  def snapshotReplace(incoming: DataFrame): DataFrame = incoming

  /** M3 `append`: concat + pk-dedupe keep-last (audit logs). */
  def append(existing: DataFrame, incoming: DataFrame, pk: Seq[String]): DataFrame =
    upsert(existing, incoming, pk)

  /** M8 scoped replace-merge (ridiculous_sentences_weekly.py:435-458):
    * drop existing rows in the replaced scope, union the replacement.
    */
  def scopedReplace(existing: DataFrame, replacement: DataFrame,
                    scopeCol: String, scopeValues: Seq[Any]): DataFrame =
    existing.filter(!col(scopeCol).isin(scopeValues: _*))
      .unionByName(replacement)

  /** M5 history dedupe with conflict evidence (history_dedupe.py:16-63):
    * group by business key; keep the first row per key (explicit order);
    * a key "conflicts" when compared columns differ across its rows.
    * Returns (deduped, conflictKeys) — conflictKeys carries the business
    * key + distinct-variant count so DQ can fail loudly.
    */
  def historyDedupe(df: DataFrame, businessKey: Seq[String],
                    compared: Seq[String], orderCol: Option[String] = None)
  : (DataFrame, DataFrame) = {
    val seqd = orderCol match {
      case Some(_) => df
      case None => df.withColumn(SEQ, monotonically_increasing_id())
    }
    val ordCol = orderCol.map(c => col(c).asc).getOrElse(col(SEQ).asc)
    val w = Window.partitionBy(businessKey.map(col): _*).orderBy(ordCol)
    val deduped = seqd.withColumn(RN, row_number().over(w))
      .filter(col(RN) === 1).drop(RN, SEQ)
    val conflicts = df.groupBy(businessKey.map(col): _*)
      .agg(countDistinct(struct(compared.map(col): _*)).as("variant_count"),
        count(lit(1)).as("row_count"))
      .filter(col("variant_count") > 1)
    (deduped, conflicts)
  }

  /** M7 temporal integrity (merge.py:33-73): valid_from ≤ valid_to and no
    * future-start row flagged current. Returns one summary row.
    */
  def temporalIntegrity(df: DataFrame, validFrom: String, validTo: String,
                        isCurrent: String, asOf: Column): DataFrame = {
    val from = col(validFrom)
    val to = col(validTo)
    df.agg(
      count(lit(1)).as("row_count"),
      count(when(from.isNotNull && to.isNotNull && from > to, 1)).as("inverted_range_count"),
      count(when(graft.functions.Fns.truthy(col(isCurrent)) && from > asOf, 1)).as("future_current_count"))
  }

  /** J7 FK integrity (merge.py:76-94): orphan children after dropping
    * null FKs (nullable FK semantics).
    */
  def fkOrphans(child: DataFrame, parent: DataFrame,
                childKey: String, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey)).distinct(), col(childKey) === col(parentKey), "left_anti")

  /** W6 overlapping-range count per entity (merge.py:97-115): sort ranges
    * by start, count rows whose start ≤ previous end.
    */
  def overlapCount(df: DataFrame, entity: String, start: String, end: String): DataFrame = {
    val w = Window.partitionBy(col(entity)).orderBy(col(start).asc, col(end).asc)
    df.withColumn("_prev_end", lag(col(end), 1).over(w))
      .groupBy(col(entity))
      .agg(count(when(col("_prev_end").isNotNull && col(start) <= col("_prev_end"), 1))
        .as("overlap_count"))
  }

  /** W3/N3 latest-row-per-group (table_members.py:259-277): prefer
    * current rows, then latest end (nulls = open = 9999-12-31), then
    * latest start.
    */
  def latestPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn(RN, row_number().over(w)).filter(col(RN) === 1).drop(RN)
  }

  /** M9 resumable fill-missing (llm_table_runner.py:361-400): rows of
    * `input` whose id has no non-null `outCol` in `existing` yet.
    */
  def missingDelta(input: DataFrame, existing: DataFrame, id: String, outCol: String): DataFrame =
    input.join(
      existing.filter(col(outCol).isNotNull && trim(col(outCol)) =!= "").select(col(id)),
      Seq(id), "left_anti")
}
