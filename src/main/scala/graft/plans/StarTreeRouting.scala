package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Coalesce, Divide, EvalMode, Expression, HllSketchEstimate, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Average, Complete, Count, HllSketchAgg, HllUnionAgg, Max, Min, Sum}
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Automatic star-tree routing as a Catalyst optimizer rule — the
  * query-side half of [[StarTree]].
  *
  * The reference rewrites eligible queries to read the star-tree
  * instead of raw docs inside its plan maker
  * (`BrokerRequestPreProcessor.java:50-78` rewrites fastHLL;
  * star-tree selection in `plan/StarTreeIndexOperator`); the Spark
  * analogue is a `Rule[LogicalPlan]` injected through
  * `SparkSessionExtensions`: an `Aggregate` whose grouping keys are a
  * subset of a registered index's dimensions and whose aggregates are
  * all tree-mergeable (SUM/MIN/MAX/COUNT/AVG over indexed metrics,
  * COUNT(*), fastHLL estimates) over the indexed fact relation is
  * replaced by a scan of the pre-aggregated rollup slice — same
  * results, no fact scan. A dimension-only WHERE between the
  * aggregate and the scan routes too: the filter re-applies over the
  * (group ∪ filter)-dim slice and the surviving pre-aggregated rows
  * merge back down to the query's groups — the reference's star-tree
  * query shape (`StarTreeIndexOperator`: traverse by predicate, then
  * aggregate pre-aggregated records).
  *
  * Safety: the rewrite only fires when EVERY aggregate expression maps
  * onto a materialized column and the grouping is non-empty (a global
  * aggregate over an empty fact table yields one row, which a cube
  * cannot reproduce); anything else leaves the plan untouched.
  * Output attribute ids are preserved via aliases, so parent operators
  * resolve unchanged.
  */
object StarTreeRegistry {
  final case class Entry(pathPrefix: String, index: StarTree.Index)

  // one table may carry SEVERAL star-trees (the reference's
  // `IndexingConfig._starTreeIndexConfigs` list — different dimension
  // subsets/split orders); key = registered path, value = all indexes
  private val entries = new TrieMap[String, Vector[Entry]]

  /** Register a built index for the fact table rooted at `path`
    * (matched against the scan's root path at rewrite time).
    * Registering a second index with the SAME dimension set replaces
    * it (rebuild); a different dimension set adds a sibling index. */
  def register(path: String, index: StarTree.Index): Unit = {
    val e = Entry(path, index)
    entries.updateWith(path) {
      case Some(v) =>
        Some(v.filterNot(_.index.dims.toSet == index.dims.toSet) :+ e)
      case None => Some(Vector(e))
    }
    ()
  }

  def clear(): Unit = entries.clear()

  def unregister(path: String): Unit = { entries.remove(path); () }

  /** Strip URI scheme (scan roots come back as `file:/...`) and any
    * trailing slashes so registered paths and scan roots compare in
    * the same form. */
  private def normalize(p: String): String = {
    val noScheme =
      try {
        val u = new java.net.URI(p)
        if (u.getScheme != null && u.getPath != null) u.getPath else p
      } catch { case _: java.net.URISyntaxException => p }
    val trimmed = noScheme.replaceAll("/+$", "")
    if (trimmed.isEmpty) "/" else trimmed
  }

  /** Exact match on the normalized root path, or a prefix match only
    * at a path-segment boundary — `/data/lineitem10.parquet` must NOT
    * hit an index registered for `/data/lineitem1` (a substring match
    * here silently answers from the wrong rollup). When several
    * registered prefixes match one scan root (a parent directory and
    * the exact table path), the LONGEST normalized prefix wins —
    * deterministic most-specific-wins, not TrieMap iteration order. */
  def lookup(rootPath: String): Option[Entry] = lookupAll(rootPath).headOption

  /** All indexes registered for the longest matching prefix, SMALLEST
    * dimension set first — the routing rule tries them in order and
    * the first index that covers the query's dims/metrics wins, so a
    * narrower (cheaper, more pre-aggregated) tree is preferred over a
    * wide one, exactly the reference's choose-the-best-tree behavior
    * across its starTreeIndexConfigs. */
  def lookupAll(rootPath: String): Seq[Entry] = {
    val root = normalize(rootPath)
    val matching = entries.toSeq.filter { case (pfx0, _) =>
      val pfx = normalize(pfx0)
      root == pfx || root.startsWith(pfx + "/")
    }
    matching.maxByOption { case (pfx, _) => normalize(pfx).length }
      .map(_._2.sortBy(e => (e.index.dims.size, e.index.dims.mkString(","))))
      .getOrElse(Vector.empty)
  }

  /** The derived-HLL "segment metadata" view of a table frame — the
    * analog of `SegmentMetadataImpl.getDerivedColumn(column, HLL)`
    * that `BrokerRequestPreProcessor.java:50-81` consults to rewrite
    * fastHLL aggregations onto an ingest-built sketch artifact. Here
    * the artifact is a registered star-tree's `hll_<col>` metric
    * sketch: the result maps each such raw column (lower-cased) to
    * the lgK values the trees were built with — several registered
    * trees may disagree, and the reference treats that inconsistency
    * as a query-time error (`BrokerRequestPreProcessor.java:86-95`),
    * so the caller must reject a rewrite over a multi-lgK column
    * rather than pick one silently. */
  def derivedHllFor(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Int]] = {
    if (entries.isEmpty) return Map.empty // skip the plan walk entirely
    val root = df.queryExecution.analyzed.collectFirst {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.headOption.map(_.toString)
    }.flatten
    root.map { r =>
      val specs = for {
        e <- lookupAll(r)
        if e.index.sketchLgK > 0
        m <- e.index.metrics
        if e.index.rollup.columns.contains(s"hll_$m")
      } yield m.toLowerCase -> e.index.sketchLgK
      specs.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    }.getOrElse(Map.empty)
  }
}

case class StarTreeRoutingRule(spark: SparkSession) extends Rule[LogicalPlan] {

  /** Peel attribute-only Projects and at most ONE Filter off the
    * aggregate's child down to an indexed fact scan. The filter (when
    * present) is the dimension predicate the reference's star-tree
    * answers by tree traversal; here it re-applies over the rollup
    * slice. */
  private def peel(plan: LogicalPlan, cond: Option[Expression])
      : Option[(Option[Expression], Seq[StarTreeRegistry.Entry])] = plan match {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      fs.location.rootPaths.headOption
        .map(p => StarTreeRegistry.lookupAll(p.toString))
        .filter(_.nonEmpty)
        .map(es => (cond, es))
    case Project(projs, child) if projs.forall(_.isInstanceOf[AttributeReference]) =>
      peel(child, cond)
    case Filter(c, child) if cond.isEmpty => peel(child, Some(c))
    case _ => None
  }

  /** Slice expression answering one aggregate, if tree-mergeable and
    * the slice materializes the needed columns (None → no rewrite, so
    * an index built before a column existed degrades to the fact scan
    * instead of crashing). AVG derives as sum/cnt — the reference's
    * AvgPair `ValueAggregator` (`data/aggregator/
    * ValueAggregatorFactory.java`) stores the same pair in the tree. */
  private def rollupExpr(e: Expression, metrics: Seq[String],
      bySlice: Map[String, org.apache.spark.sql.catalyst.expressions.Attribute],
      sketchLgK: Int): Option[Expression] = e match {
    // fastHLL family: estimate of the STORED group sketch — HLL
    // register state is insertion-order invariant, so this equals the
    // query-time hll_sketch_agg over the same rows bit-for-bit,
    // provided lgK matches the one the tree was built with.
    // approx_count_distinct (HLL++) deliberately does NOT route: a
    // different sketch algorithm would silently change estimates.
    case HllSketchEstimate(
        AggregateExpression(h: HllSketchAgg, Complete, false, None, _))
        if sketchLgK > 0 =>
      (h.left, h.right) match {
        case (ar: AttributeReference, Literal(lgk: Int, _))
            if metrics.contains(ar.name) && lgk == sketchLgK =>
          bySlice.get(s"hll_${ar.name}").map(HllSketchEstimate(_))
        case _ => None
      }
    case AggregateExpression(Sum(ar: AttributeReference, _), Complete, false, None, _)
        if metrics.contains(ar.name) => bySlice.get(s"sum_${ar.name}")
    case AggregateExpression(Min(ar: AttributeReference), Complete, false, None, _)
        if metrics.contains(ar.name) => bySlice.get(s"min_${ar.name}")
    case AggregateExpression(Max(ar: AttributeReference), Complete, false, None, _)
        if metrics.contains(ar.name) => bySlice.get(s"max_${ar.name}")
    case AggregateExpression(Average(ar: AttributeReference, _), Complete, false, None, _)
        if metrics.contains(ar.name) && !ar.dataType.isInstanceOf[DecimalType] =>
      // sum/cnt in double — Average's own result type for non-decimal
      // inputs; cnt = 0 gives a null sum, hence null avg, matching the
      // empty-group semantics. LEGACY divide: never ANSI-error here.
      for {
        s <- bySlice.get(s"sum_${ar.name}")
        c <- bySlice.get(s"cnt_${ar.name}")
      } yield Divide(Cast(s, DoubleType), Cast(c, DoubleType), EvalMode.LEGACY)
    // COUNT is non-nullable but a slice attribute read back from the
    // rollup is nullable — Coalesce restores the original contract so
    // the attribute's nullability matches what parents resolved
    // (values are never null: every slice row aggregated ≥1 fact row)
    case AggregateExpression(Count(Seq(Literal(1, _))), Complete, false, None, _) =>
      bySlice.get("star_count").map(a => Coalesce(Seq(a, Literal(0L))))
    case AggregateExpression(Count(Seq(ar: AttributeReference)), Complete, false, None, _)
        if metrics.contains(ar.name) =>
      bySlice.get(s"cnt_${ar.name}").map(a => Coalesce(Seq(a, Literal(0L))))
    case _ => None
  }

  private def aggE(f: AggregateFunction): AggregateExpression =
    AggregateExpression(f, Complete, isDistinct = false)

  /** RE-AGGREGATING form of [[rollupExpr]] for the filtered path: the
    * slice carries one row per (group ∪ filter)-dim combination, so
    * after the dimension filter the remaining rows merge back down to
    * the query's groups — sums add, min/max re-extremize, counts add,
    * AVG re-derives from summed (sum, cnt), HLL sketches union.
    * Exact aggregates merge exactly; the unioned-HLL estimate can
    * differ from a directly-built sketch WITHIN the sketch's error
    * contract (sparse→dense promotion depends on merge topology) —
    * the same approximation contract as the reference's tree-HLL.
    * Exactly the reference's star-tree execution: aggregate
    * pre-aggregated records below the filter
    * (`StarTreeIndexOperator` + the ValueAggregator merge path). */
  private def reAggExpr(e: Expression, metrics: Seq[String],
      bySlice: Map[String, org.apache.spark.sql.catalyst.expressions.Attribute],
      sketchLgK: Int): Option[Expression] = e match {
    case HllSketchEstimate(
        AggregateExpression(h: HllSketchAgg, Complete, false, None, _))
        if sketchLgK > 0 =>
      (h.left, h.right) match {
        case (ar: AttributeReference, Literal(lgk: Int, _))
            if metrics.contains(ar.name) && lgk == sketchLgK =>
          bySlice.get(s"hll_${ar.name}")
            .map(a => HllSketchEstimate(aggE(HllUnionAgg(a, Literal(false)))))
        case _ => None
      }
    case AggregateExpression(Sum(ar: AttributeReference, _), Complete, false, None, _)
        if metrics.contains(ar.name) =>
      // re-summing a DecimalType sum widens precision by another 10
      // digits — cast back so the attribute under the original exprId
      // keeps the dataType downstream operators resolved against
      // (overflow on the cast would have overflowed the original Sum
      // too, so the error behavior is unchanged)
      bySlice.get(s"sum_${ar.name}").map { a =>
        val merged = aggE(Sum(a))
        if (merged.dataType == e.dataType) merged else Cast(merged, e.dataType)
      }
    case AggregateExpression(Min(ar: AttributeReference), Complete, false, None, _)
        if metrics.contains(ar.name) =>
      bySlice.get(s"min_${ar.name}").map(a => aggE(Min(a)))
    case AggregateExpression(Max(ar: AttributeReference), Complete, false, None, _)
        if metrics.contains(ar.name) =>
      bySlice.get(s"max_${ar.name}").map(a => aggE(Max(a)))
    case AggregateExpression(Average(ar: AttributeReference, _), Complete, false, None, _)
        if metrics.contains(ar.name) && !ar.dataType.isInstanceOf[DecimalType] =>
      for {
        s <- bySlice.get(s"sum_${ar.name}")
        c <- bySlice.get(s"cnt_${ar.name}")
      } yield Divide(Cast(aggE(Sum(s)), DoubleType),
        Cast(aggE(Sum(c)), DoubleType), EvalMode.LEGACY)
    // COUNT→SUM flips nullability (Count is non-nullable, Sum is not);
    // Coalesce restores the contract — a group only exists here if ≥1
    // slice row survived the filter, so the sum is never actually null
    case AggregateExpression(Count(Seq(Literal(1, _))), Complete, false, None, _) =>
      bySlice.get("star_count").map(a =>
        Coalesce(Seq(Cast(aggE(Sum(a)), e.dataType), Literal(0L))))
    case AggregateExpression(Count(Seq(ar: AttributeReference)), Complete, false, None, _)
        if metrics.contains(ar.name) =>
      bySlice.get(s"cnt_${ar.name}").map(a =>
        Coalesce(Seq(Cast(aggE(Sum(a)), e.dataType), Literal(0L))))
    case _ => None
  }

  /** Rewrite an aggregate-output expression bottom-up: every embedded
    * aggregate (or sketch-estimate-of-aggregate) goes through
    * `replaceAgg`, remaining attribute references must be grouping
    * dims (mapped to their slice attributes), scalar wrappers —
    * `round(sum(x), 3)`, arithmetic over two aggregates — carry over
    * unchanged. None anywhere → the whole rewrite falls back. */
  private def rewriteBody(body: Expression, groupNames: Set[String],
      bySlice: Map[String, org.apache.spark.sql.catalyst.expressions.Attribute],
      replaceAgg: Expression => Option[Expression]): Option[Expression] = body match {
    case h @ HllSketchEstimate(_: AggregateExpression) => replaceAgg(h)
    case a: AggregateExpression => replaceAgg(a)
    case ar: AttributeReference =>
      if (groupNames.contains(ar.name)) bySlice.get(ar.name) else None
    case other =>
      val kids = other.children.map(rewriteBody(_, groupNames, bySlice, replaceAgg))
      if (kids.forall(_.isDefined)) {
        if (kids.isEmpty) Some(other)
        else Some(other.withNewChildren(kids.map(_.get)))
      } else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // grouped AND global aggregates route: a global aggregate (no
    // GROUP BY) re-aggregates the cube's all-stars slice — the
    // Aggregate node is KEPT (empty grouping always emits exactly one
    // row, even over an empty rollup, matching the one-row contract of
    // a global aggregate over an empty fact table)
    case agg @ Aggregate(groupings, aggExprs, child, _) =>
      // several indexes may be registered for one table — smallest
      // dimension set first (lookupAll's order); the first whose
      // dims/metrics cover the query wins
      val rewritten = peel(child, None).flatMap { case (cond, candidates) =>
        candidates.view.flatMap(entry =>
          tryEntry(agg, groupings, aggExprs, cond, entry)).headOption
      }
      rewritten.getOrElse(agg)
  }

  /** Attempt the rewrite against ONE candidate index; None when the
    * index does not cover the query (wrong dims, missing metric or
    * sketch column, non-dim filter) — the caller then tries the next
    * candidate. */
  private def tryEntry(agg: Aggregate,
      groupings: Seq[Expression], aggExprs: Seq[NamedExpression],
      cond: Option[Expression],
      entry: StarTreeRegistry.Entry): Option[LogicalPlan] = {
      val rewritten = for {
        dims <- Some(entry.index.dims)
        groupAttrs <- Some(groupings).collect {
          case gs if gs.forall {
            case ar: AttributeReference => dims.contains(ar.name)
            case _ => false
          } => gs.map(_.asInstanceOf[AttributeReference])
        }
        // a dimension-only, deterministic predicate can re-apply over
        // the slice; anything touching a non-dim column cannot
        _ <- cond match {
          case None => Some(())
          case Some(c) if c.deterministic &&
              c.references.forall(a => dims.contains(a.name)) => Some(())
          case _ => None
        }
        condDims = cond.map(_.references.map(_.name).toSeq).getOrElse(Nil)
        sliceDims = dims.filter(d =>
          groupAttrs.exists(_.name == d) || condDims.contains(d))
        slicePlan = entry.index.slice(sliceDims).queryExecution.analyzed
        bySlice = slicePlan.output.map(a => a.name -> a).toMap
        groupNames = groupAttrs.map(_.name).toSet
        // the direct-projection form only fits the grouped unfiltered
        // case (slice rows ARE the groups); filtered or GLOBAL
        // aggregates keep the Aggregate node and merge slice rows
        reAggregate = cond.isDefined || groupAttrs.isEmpty
        replaceAgg = (e: Expression) =>
          if (!reAggregate) rollupExpr(e, entry.index.metrics, bySlice, entry.index.sketchLgK)
          else reAggExpr(e, entry.index.metrics, bySlice, entry.index.sketchLgK)
        newOut <- traverse[NamedExpression, NamedExpression](aggExprs) {
          case ar: AttributeReference if groupAttrs.exists(_.exprId == ar.exprId) =>
            bySlice.get(ar.name).map(src => Alias(src, ar.name)(exprId = ar.exprId))
          case al @ Alias(body, _) =>
            rewriteBody(body, groupNames, bySlice, replaceAgg)
              .map(expr => Alias(expr, al.name)(exprId = al.exprId))
          case _ => None
        }
      } yield {
        if (!reAggregate)
          // direct projection: slice rows ARE the query's groups
          Project(newOut, slicePlan)
        else {
          // filtered and/or global: [filter] the (group ∪ filter)-dim
          // slice, then merge the surviving pre-aggregated rows back
          // down to the query's groups (one row, for a global agg)
          val newChild = cond match {
            case Some(c) => Filter(c.transform {
              case ar: AttributeReference => bySlice(ar.name)
            }, slicePlan)
            case None => slicePlan
          }
          agg.copy(
            groupingExpressions = groupAttrs.map(a => bySlice(a.name)),
            aggregateExpressions = newOut,
            child = newChild)
        }
      }
      rewritten
  }

  private def traverse[A, B](xs: Seq[A])(f: A => Option[B]): Option[Seq[B]] = {
    val out = xs.map(f)
    if (out.forall(_.isDefined)) Some(out.map(_.get)) else None
  }
}
