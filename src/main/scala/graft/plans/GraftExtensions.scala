package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, JoinHint, LeafNode, LogicalPlan, Project, SubqueryAlias, Filter => LFilter}
import org.apache.spark.sql.catalyst.rules.Rule

/** Engine-level Catalyst extensions, installable by config
  * (`spark.sql.extensions=graft.plans.GraftExtensions`) or
  * `builder.withExtensions(new GraftExtensions)`. Every graft session
  * (Verify, Bench, specs) runs with them on, so the whole oracle suite
  * exercises the injected rule.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteMultiDistinctCounts)
    // the codegen F2 fuzzy-join key (functions/NormalizeNameExpr) as a
    // built-in: `SELECT normalize_name(c)` works in every graft session
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("normalize_name"),
      new ExpressionInfo(classOf[graft.functions.NormalizeNameExpr].getName,
        "normalize_name"),
      (exprs: Seq[Expression]) => graft.functions.NormalizeNameExpr(exprs.head)))
    // the vector/ANN codegen kernels (functions/VecExprs) — model
    // parameters arrive as foldable literals and are unpacked ONCE here
    // at plan-build time, so generated code never touches them per row
    import graft.functions._
    def fn(name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new ExpressionInfo(classOf[VecKernels.type].getName, name), builder))
    fn("graft_quantize", exprs => QuantizeVec(exprs.head))
    fn("graft_sub_arrays", exprs => SubLongArrays(exprs(0), exprs(1)))
    fn("graft_sq_dist", exprs => SqDistLongArrays(exprs(0), exprs(1)))
    fn("graft_dot_long", exprs => DotLongArrays(exprs(0), exprs(1)))
    fn("graft_sq_dist_const", exprs =>
      SqDistToConst(exprs(0), VecExprs.constLongs(exprs(1))))
    fn("graft_pq_dists", exprs => PqSubspaceDists(exprs(0),
      VecExprs.constInt(exprs(1)), VecExprs.constLongMatrix(exprs(2))))
    fn("graft_pq_code", exprs => PqCodeExpr(exprs(0),
      VecExprs.constInt(exprs(1)), VecExprs.constLongMatrix(exprs(2))))
    fn("graft_adc_sum", exprs => AdcSumExpr(exprs(0), exprs(1)))
    fn("graft_assign_cell", exprs =>
      AssignCellExpr(exprs(0), VecExprs.constLongMatrix(exprs(1))))
  }
}

/** Rewrites an Aggregate containing 2+ COUNT(DISTINCT x) over *different*
  * expressions into a join of single-distinct aggregates.
  *
  * Spark plans multi-distinct aggregates by Expanding every input row
  * once per distinct group (RewriteDistinctAggregates) — at 100 TB that
  * triples the shuffle volume of the largest table. Each distinct count
  * is instead computed as dedup-then-count (two combinable hash
  * aggregates, full map-side partial aggregation) and the per-group
  * results are joined back on the grouping keys. Correctness: every leg
  * aggregates the same child, so each leg yields exactly the same group
  * set and the null-safe inner join loses nothing; `count(cols)` after
  * the dedup skips null keys exactly like COUNT(DISTINCT).
  *
  * This automates the hand-written q05 pattern (queries/Relational.scala)
  * — PlanAuditSpec pins the Expand staying gone there; ExtensionsSpec
  * pins this rule doing the same rewrite on a naive multi-distinct plan.
  *
  * Conservative gate — the rewrite only fires when:
  *  - every grouping expression is a plain Attribute,
  *  - every output is a grouping attribute or an Alias of exactly one
  *    AggregateExpression with no FILTER clause,
  *  - every DISTINCT aggregate is a Count,
  *  - there are >= 2 distinct-expression groups (the Expand case; one
  *    group plans fine natively),
  *  - the aggregate's child is a scan/filter/project chain (a leaf plus
  *    cheap unary nodes). Each leg re-executes the child, so the rewrite
  *    only pays when re-execution means one extra column-pruned scan;
  *    over a join/explode/aggregate child, re-running the pipeline per
  *    leg costs more than the Expand it avoids (found the hard way on
  *    the q65 contamination plan: two full scan+explode+broadcast-join
  *    pipelines for one query), so those stay on Spark's native path.
  * Anything else is left for Spark's own RewriteDistinctAggregates.
  */
object RewriteMultiDistinctCounts extends Rule[LogicalPlan] {

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(groupingExprs, aggExprs, child, hint)
        if hint.isEmpty && cheapToRecompute(child) &&
          eligible(groupingExprs, aggExprs) =>
      rewrite(groupingExprs.map(_.asInstanceOf[Attribute]), aggExprs, child)
  }

  /** True when re-executing `p` once per leg costs no more than an extra
    * column-pruned scan: a leaf under any chain of projects/filters.
    */
  @annotation.tailrec
  private def cheapToRecompute(p: LogicalPlan): Boolean = p match {
    case Project(_, c)        => cheapToRecompute(c)
    case LFilter(_, c)        => cheapToRecompute(c)
    case SubqueryAlias(_, c)  => cheapToRecompute(c)
    case _: LeafNode          => true
    case _                    => false
  }

  private def splitOutputs(groupingExprs: Seq[Expression],
                           aggExprs: Seq[NamedExpression]):
      Option[Seq[scala.Either[Attribute, (Alias, AggregateExpression)]]] = {
    val groupSet = AttributeSet(groupingExprs.collect { case a: Attribute => a })
    val parts = aggExprs.map {
      case a: Attribute if groupSet.contains(a) => Some(scala.Left(a))
      case al @ Alias(ae: AggregateExpression, _) if ae.filter.isEmpty =>
        Some(scala.Right((al, ae)))
      case _ => None
    }
    if (parts.forall(_.isDefined)) Some(parts.flatten) else None
  }

  private def eligible(groupingExprs: Seq[Expression],
                       aggExprs: Seq[NamedExpression]): Boolean = {
    if (!groupingExprs.forall(_.isInstanceOf[Attribute])) return false
    splitOutputs(groupingExprs, aggExprs) match {
      case None => false
      case Some(parts) =>
        val aggs = parts.collect { case scala.Right(p) => p }
        val distincts = aggs.filter(_._2.isDistinct)
        distincts.forall(_._2.aggregateFunction.isInstanceOf[Count]) &&
          distincts.map(_._2.aggregateFunction.children.map(_.canonicalized))
            .distinct.size >= 2
    }
  }

  private def rewrite(gAttrs: Seq[Attribute], aggExprs: Seq[NamedExpression],
                      child: LogicalPlan): LogicalPlan = {
    val parts = splitOutputs(gAttrs, aggExprs).get
    val aggs = parts.collect { case scala.Right(p) => p }
    val (distincts, plains) = aggs.partition(_._2.isDistinct)

    // leg 0: all non-distinct aggregates in one pass (absent when the
    // aggregate was distinct-only)
    val plainLeg: Option[LogicalPlan] =
      if (plains.isEmpty) None
      else Some(Aggregate(gAttrs, gAttrs ++ plains.map(_._1), child))

    // one leg per distinct-expression group: dedup on (keys, exprs), then
    // a plain count — both stages combinable, no Expand anywhere
    val distinctLegs: Seq[LogicalPlan] =
      distincts.groupBy(_._2.aggregateFunction.children.map(_.canonicalized))
        .toSeq.sortBy(_._2.head._1.exprId.id).map { case (_, group) =>
          val exprs = group.head._2.aggregateFunction.children
          val gSet = AttributeSet(gAttrs)
          val named = exprs.zipWithIndex.map {
            // re-alias a counted expression that is itself a grouping
            // attribute, else the inner output would repeat an ExprId
            case (a: Attribute, _) if !gSet.contains(a) => a
            case (e, i) => Alias(e, s"_graft_dk$i")()
          }
          val inner = Aggregate(gAttrs ++ exprs, gAttrs ++ named, child)
          val countAttrs: Seq[Expression] = named.map(_.toAttribute)
          val outs = group.map { case (al, _) =>
            Alias(Count(countAttrs).toAggregateExpression(), al.name)(
              exprId = al.exprId, qualifier = al.qualifier)
          }
          Aggregate(gAttrs, gAttrs ++ outs, inner)
        }

    val legs = plainLeg.toSeq ++ distinctLegs
    val joined = legs.tail.foldLeft(legs.head) { (acc, leg) =>
      // expose the leg's grouping keys under fresh ExprIds so the join's
      // two sides never share attributes (self-join ambiguity)
      val legAggAttrs = leg.output.drop(gAttrs.length)
      val freshKeys = gAttrs.map(a => Alias(a, a.name)())
      val proj = Project(freshKeys ++ legAggAttrs, leg)
      val cond = gAttrs.zip(freshKeys)
        .map { case (l, r) => EqualNullSafe(l, r.toAttribute): Expression }
        .reduceOption(And)
      Join(acc, proj, if (cond.isEmpty) Cross else Inner, cond, JoinHint.NONE)
    }

    // restore the original output order; aggregate attributes keep their
    // original ExprIds, so nothing upstream re-resolves
    val byId = aggs.map { case (al, _) => al.exprId -> al.toAttribute }.toMap
    val finalOut: Seq[NamedExpression] = parts.map {
      case scala.Left(gattr) => gattr
      case scala.Right((al, _)) => byId(al.exprId)
    }
    Project(finalOut, joined)
  }
}
