package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Divide, EvalMode, Expression, HllSketchEstimate, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Complete, Count, HllSketchAgg, Max, Min, Sum}
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
  * all tree-mergeable (SUM/MIN/MAX over indexed metrics, COUNT(*))
  * over the indexed fact relation is replaced by a scan of the
  * pre-aggregated rollup slice — same results, no fact scan.
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

  private val entries = new TrieMap[String, Entry]

  /** Register a built index for the fact table rooted at `path`
    * (matched against the scan's root path at rewrite time). */
  def register(path: String, index: StarTree.Index): Unit =
    entries.put(path, Entry(path, index))

  def clear(): Unit = entries.clear()

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
    * here silently answers from the wrong rollup). */
  def lookup(rootPath: String): Option[Entry] = {
    val root = normalize(rootPath)
    entries.values.find { e =>
      val pfx = normalize(e.pathPrefix)
      root == pfx || root.startsWith(pfx + "/")
    }
  }
}

case class StarTreeRoutingRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def factEntry(plan: LogicalPlan): Option[StarTreeRegistry.Entry] = plan match {
    case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      fs.location.rootPaths.headOption
        .flatMap(p => StarTreeRegistry.lookup(p.toString))
    case Project(projs, child) if projs.forall(_.isInstanceOf[AttributeReference]) =>
      factEntry(child)
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
    case AggregateExpression(Count(Seq(Literal(1, _))), Complete, false, None, _) =>
      bySlice.get("star_count")
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(groupings, aggExprs, child, _) if groupings.nonEmpty =>
      val rewritten = for {
        entry <- factEntry(child)
        dims = entry.index.dims
        groupAttrs <- Some(groupings).collect {
          case gs if gs.forall {
            case ar: AttributeReference => dims.contains(ar.name)
            case _ => false
          } => gs.map(_.asInstanceOf[AttributeReference])
        }
        slicePlan = entry.index
          .slice(groupAttrs.map(_.name))
          .queryExecution.analyzed
        bySlice = slicePlan.output.map(a => a.name -> a).toMap
        // every output: either a grouping attr or a mergeable aggregate
        projections <- traverse[NamedExpression, NamedExpression](aggExprs) {
          case ar: AttributeReference if groupAttrs.exists(_.exprId == ar.exprId) =>
            bySlice.get(ar.name).map(src => Alias(src, ar.name)(exprId = ar.exprId))
          case al @ Alias(body, _)
              if body.isInstanceOf[AggregateExpression] ||
                body.isInstanceOf[HllSketchEstimate] =>
            rollupExpr(body, entry.index.metrics, bySlice, entry.index.sketchLgK)
              .map(expr => Alias(expr, al.name)(exprId = al.exprId))
          case _ => None
        }
      } yield Project(projections, slicePlan)
      rewritten.getOrElse(agg)
  }

  private def traverse[A, B](xs: Seq[A])(f: A => Option[B]): Option[Seq[B]] = {
    val out = xs.map(f)
    if (out.forall(_.isDefined)) Some(out.map(_.get)) else None
  }
}
