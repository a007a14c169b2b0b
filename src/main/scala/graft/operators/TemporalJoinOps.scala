package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins, built scale-first.
  *
  * The reference has no as-of or range joins (SURVEY §2.5: all joins are
  * string equi-joins), but a training-data pipeline at 100 TB needs both —
  * attach-latest-state lookups and point-in-window attribution. Both
  * operators here compose existing Spark operators (SURVEY §7.3 preference
  * (a)): no custom physical plan is needed because the semantics reduce to
  * one shuffle each.
  *
  * - asOfJoin: union + single keyed window, instead of the per-key
  *   backward-scan a native engine would do. One shuffle on the join keys;
  *   state per window row is one packed struct (`last(_, ignoreNulls)`),
  *   so a key with billions of rows streams through its sorted partition
  *   without materializing pair candidates.
  * - pointInIntervalJoin: time-bucketed equi-join instead of the
  *   BroadcastNestedLoopJoin/Cartesian Spark plans for non-equi range
  *   predicates. Work is linear in points + interval-bucket coverage,
  *   and the bucket key shuffles both sides — no broadcast requirement,
  *   no O(points × intervals) blowup.
  */
object TemporalJoinOps {

  private val T = "_graft_asof_t"
  private val SIDE = "_graft_asof_side"
  private val TIE = "_graft_asof_tie"
  private val P = "_graft_asof_p"

  /** As-of join: for each left row, attach the payload of the nearest
    * right row with the same keys — the latest with rightTime <=
    * leftTime when direction="backward" (the default; inclusive,
    * DuckDB/pandas `merge_asof` semantics), or the earliest with
    * rightTime >= leftTime when direction="forward". Unmatched left
    * rows keep nulls (left-outer shape).
    *
    * Matched right columns (rightTime plus `payload`) are returned with
    * `prefix` prepended, so a self-join on one table never collides.
    *
    * Ties on (keys, rightTime) are broken toward the largest `tieBreak`
    * value when given (pass a stable id for deterministic output —
    * Spark has no implicit row order to fall back on, SURVEY §7.4).
    *
    * `toleranceUs`: when set, a match further away than the tolerance
    * (in microseconds of |leftTime − rightTime|) is discarded — the row
    * stays, its matched columns go null, like merge_asof(tolerance=...).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String, payload: Seq[String],
               tieBreak: Option[String] = None,
               toleranceUs: Option[Long] = None,
               prefix: String = "asof_",
               direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward or forward, got $direction")
    val fwd = direction == "forward"
    val payloadCols = (rightTime +: payload).distinct
    val tieCol = tieBreak.map(col).getOrElse(lit(null).cast("long"))
    val r = right.select(
      (keys.map(col) :+ col(rightTime).as(T) :+ tieCol.as(TIE) :+
        struct(payloadCols.map(col): _*).as(P)): _*)
      .withColumn(SIDE, lit(0))
    val l = left
      .withColumn(T, col(leftTime))
      .withColumn(SIDE, lit(1))
    // Backward: cumulative window over (time asc); right rows sort
    // before left rows at equal time (SIDE 0 < 1), so a right row at
    // exactly leftTime is visible — the inclusive `>=` of DuckDB ASOF
    // JOIN. Forward: the same construction over (time desc) picks the
    // earliest following row. Either way `last` takes the right row
    // sorted nearest the left one, so the largest tie-break must sort
    // last among equal-time right rows: TIE stays ascending.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(
        (if (fwd) col(T).desc else col(T).asc),
        col(SIDE).asc,
        col(TIE).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = last(col(P), ignoreNulls = true).over(w)
    val gapUs =
      if (fwd) unix_micros(matchedRaw(rightTime)) - unix_micros(col(T))
      else unix_micros(col(T)) - unix_micros(matchedRaw(rightTime))
    val matched = toleranceUs match {
      case Some(tol) => when(gapUs <= tol, matchedRaw)
      case None => matchedRaw
    }
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(P, matched)
      .filter(col(SIDE) === 1)
      .select((left.columns.map(col) ++
        payloadCols.map(f => col(P)(f).as(prefix + f))): _*)
  }

  private val BKT = "_graft_range_bucket"

  /** Point-in-interval join: rows of `points` paired with every row of
    * `intervals` whose [startTs, endTs] (inclusive) contains pointTs.
    * Intervals may overlap arbitrarily and need no key in common with
    * the points (the non-equi case Spark plans as a nested-loop join).
    *
    * Each interval explodes into the time buckets it covers; each point
    * maps to its one bucket; an equi shuffle join on the bucket plus the
    * exact range filter yields each qualifying pair exactly once (a
    * point's bucket is unique, so no dedup pass is needed). Pick
    * `bucketSeconds` near the typical interval span: replication per
    * interval is span/bucket + 1, while a too-coarse bucket packs
    * unrelated points into the same join group.
    *
    * Column names must be simple and distinct across the two inputs
    * (payloads of both sides pass through unrenamed).
    */
  def pointInIntervalJoin(points: DataFrame, intervals: DataFrame,
                          pointTs: String, startTs: String, endTs: String,
                          bucketSeconds: Long): DataFrame = {
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty, s"column collision between sides: $overlap")
    val bucketUs = bucketSeconds * 1000000L
    val p = points.withColumn(BKT, expr(s"unix_micros($pointTs) div ${bucketUs}L"))
    val i = intervals.withColumn(BKT, explode(expr(
      s"sequence(unix_micros($startTs) div ${bucketUs}L, unix_micros($endTs) div ${bucketUs}L)")))
    p.join(i, p(BKT) === i(BKT) &&
        col(pointTs) >= col(startTs) && col(pointTs) <= col(endTs))
      .drop(BKT)
  }
}
