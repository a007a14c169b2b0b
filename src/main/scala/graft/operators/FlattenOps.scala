package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.io.StableJson

/** Generic JSON flatten engine (SURVEY §2.4 N1-N7): the reference repeats
  * one per-table flatten template 31 times (unwrap wrapper keys → explode
  * membership-style arrays → per-field fallback extraction); here a single
  * declarative spec drives codegen-friendly `get_json_object`/`from_json`
  * expressions, so each table is just data.
  */
object FlattenOps {

  /** One output field: first non-blank among the fallback JSON paths
    * (reference _first_text, table_members.py:365-373). rawText forces
    * extraction through get_json_object so the value is the DOCUMENT-ORDER
    * substring of the original text — required only when downstream hashes
    * depend on source key order (the generated-debate-id quirk); everything
    * else extracts from the once-parsed variant.
    */
  final case class FieldSpec(name: String, paths: Seq[String], default: String = "",
                             rawText: Boolean = false)

  /** One table flatten: optional wrapper unwrap (the payload nests the
    * entity under one of several keys), optional array explode, fields.
    * indexField exposes the 0-based array position of each exploded item —
    * the reference's builders thread `enumerate()` indices into surrogate
    * ids and order columns (table_bill_sponsors.py:168, table_bill_events.py
    * event_order), so position must survive the explode.
    */
  final case class FlattenSpec(
      wrapperKeys: Seq[String] = Nil,      // e.g. member|person|memberDetails
      explodePath: Option[String] = None,  // e.g. memberships
      parentFields: Seq[FieldSpec] = Nil,  // extracted from the unwrapped payload
      fields: Seq[FieldSpec] = Nil,        // extracted from each exploded item
      indexField: Option[String] = None,   // 0-based explode position column
      // every reference explode skips non-Mapping array items but keeps
      // their enumerate() index (table_bill_sponsors.py:167-171,
      // table_bill_stages.py:169-171, table_members.py:332) — so malformed
      // scalar entries must not fan out into all-default rows
      objectItemsOnly: Boolean = true)

  /** Path "$" = the whole (unwrapped) JSON value — used when a transform
    * needs the raw payload (e.g. record-hash fallback ids).
    */
  private def jget(json: Column, path: String): Column =
    if (path == "$") json else get_json_object(json, "$." + path)

  private def nonBlankOrNull(c: Column): Column =
    when(trim(coalesce(c, lit(""))) === "", lit(null)).otherwise(trim(c))

  /** Unwrap `{wrapper: {...}}` payloads: first wrapper key that resolves
    * wins, else the payload itself (table_members.py:151-234 N1).
    */
  def unwrap(json: Column, wrapperKeys: Seq[String]): Column =
    if (wrapperKeys.isEmpty) json
    else coalesce(wrapperKeys.map(k => jget(json, k)) :+ json: _*)

  /** Apply a flatten spec to a DataFrame with a raw-JSON string column.
    * Explode (if any) yields one row per array element; every field is a
    * coalesce over its fallback paths. All expressions — stays inside
    * whole-stage codegen, no UDFs, no schema inference pass.
    */
  /** String view of an already-extracted variant sub-value: scalars cast
    * directly; objects/arrays fall back to their JSON re-serialization
    * (get_json_object's behavior); JSON null stays SQL null (to_json would
    * render the text "null").
    */
  private def vstr(sub: Column): Column =
    when(sub.isNull || is_variant_null(sub), lit(null).cast("string"))
      .otherwise(coalesce(try_variant_get(sub, "$", "string"), to_json(sub)))

  /** The variant parses ONCE per row, and each (field, path) sub-variant is
    * extracted ONCE into an intermediate projection: fallback chains average
    * ~25 paths per table, and both the original per-path text re-parse
    * (get_json_object) and the naive 3-walks-per-path variant formulation
    * (null-check walk + string walk + to_json walk — CaseWhen branches
    * defeat codegen subexpression elimination) dominated the flatten cost.
    * The two-step select survives Catalyst because CollapseProject refuses
    * to inline a non-cheap expression referenced more than once. Parent
    * fields are extracted BEFORE the explode — per document, not per
    * exploded item.
    */
  def flatten(df: DataFrame, jsonCol: String, spec: FlattenSpec): DataFrame = {
    // phase-1 intermediate name per (field, path) — unique, pruned later
    def subName(fieldIdx: Int, pathIdx: Int, parent: Boolean) =
      (if (parent) "_pv" else "_iv") + s"_${fieldIdx}_$pathIdx"

    // phase-1: one root-walk per referenced path
    def subCols(srcV: Column, fields: Seq[FieldSpec], parent: Boolean): Seq[Column] =
      fields.zipWithIndex.flatMap { case (f, fi) =>
        if (f.rawText) Nil
        else f.paths.zipWithIndex.collect { case (p, pi) if p != "$" =>
          try_variant_get(srcV, "$." + p, "variant").as(subName(fi, pi, parent))
        }
      }

    // phase-2: assemble the field from its pre-extracted subs
    def extract(srcRaw: Column, f: FieldSpec, fi: Int, parent: Boolean): Column = {
      def one(p: String, pi: Int): Column =
        if (f.rawText) jget(srcRaw, p)
        else if (p == "$") srcRaw
        else vstr(col(subName(fi, pi, parent)))
      coalesce(f.paths.zipWithIndex.map { case (p, pi) =>
        nonBlankOrNull(one(p, pi)) } :+ lit(f.default): _*).as(f.name)
    }

    val unwrapped = unwrap(col(jsonCol), spec.wrapperKeys)
    // parse the parent BEFORE any explode — one variant build per document;
    // the explode yields VARIANT elements directly (no per-item text
    // round-trip), and the raw item text materializes only when a rawText
    // or "$" field actually references it (column pruning drops it
    // otherwise)
    val withParent = df.withColumn("_parent", unwrapped)
      .withColumn("_parent_v", try_parse_json(col("_parent")))
    // parent fields resolve per document, pre-explode
    val parentDone = withParent
      .select(col("*") +: subCols(col("_parent_v"), spec.parentFields, parent = true): _*)
      .select(Seq(col("_parent"), col("_parent_v")) ++
        spec.parentFields.zipWithIndex.map { case (f, fi) =>
          extract(col("_parent"), f, fi, parent = true) }: _*)
    val parsed = spec.explodePath match {
      case Some(path) =>
        val arr = try_variant_get(col("_parent_v"), "$." + path, "array<variant>")
        val exploded0 =
          if (spec.indexField.isDefined)
            parentDone.select(col("*"), posexplode(arr).as(Seq("_idx", "_item_v")))
          else parentDone.withColumn("_item_v", explode(arr))
        // an object casts to map<string,variant>; scalars/arrays try-cast
        // to null — the posexplode index above already counted the skipped
        // item, matching the reference's enumerate-then-continue
        // (table_bill_sponsors.py:167-171)
        val exploded =
          if (spec.objectItemsOnly)
            exploded0.filter(
              try_variant_get(col("_item_v"), "$", "map<string,variant>").isNotNull)
          else exploded0
        exploded.withColumn("_item", to_json(col("_item_v")))
      case None =>
        parentDone.withColumn("_item", col("_parent"))
          .withColumn("_item_v", col("_parent_v"))
    }
    val withItemSubs = parsed
      .select(col("*") +: subCols(col("_item_v"), spec.fields, parent = false): _*)
    val out = spec.parentFields.map(f => col(f.name)) ++
      spec.fields.zipWithIndex.map { case (f, fi) =>
        extract(col("_item"), f, fi, parent = false) } ++
      spec.indexField.map(n => col("_idx").cast("long").as(n)).toSeq
    withItemSubs.select(out: _*)
  }

  /** F16 key-path discovery (table_members.py:419-433): depth-bounded walk
    * of sampled payloads, for humans designing FlattenSpecs — driver-side
    * over a bounded sample, as in the reference.
    */
  def discoverKeyPaths(df: DataFrame, jsonCol: String, sample: Int = 50,
                       maxDepth: Int = 6): Seq[(String, Long)] = {
    def walk(value: Any, prefix: String, depth: Int): Set[String] = {
      if (depth >= maxDepth) Set.empty
      else value match {
        case m: Map[_, _] =>
          m.asInstanceOf[Map[String, Any]].flatMap { case (k, v) =>
            val p = if (prefix.isEmpty) k else s"$prefix.$k"
            Set(p) ++ walk(v, p, depth + 1)
          }.toSet
        case s: Seq[_] =>
          val p = if (prefix.isEmpty) "[]" else s"$prefix[]"
          Set(p) ++ s.headOption.toSet.flatMap((h: Any) => walk(h, p, depth + 1))
        case _ => Set.empty
      }
    }
    val samples = df.select(col(jsonCol)).limit(sample).collect().map(_.getString(0))
    samples.flatMap(j => scala.util.Try(walk(StableJson.parse(j), "", 0)).getOrElse(Set.empty))
      .groupBy(identity).map { case (p, occ) => (p, occ.length.toLong) }
      .toSeq.sortBy(p => (-p._2, p._1))
  }
}
