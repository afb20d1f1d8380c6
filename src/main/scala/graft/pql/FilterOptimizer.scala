package graft.pql

import graft.pql.Pql._

/** The reference broker's per-request filter-tree optimizers and their
  * `optimizationFlags` toggle surface
  * (`pinot-broker/.../requesthandler/BrokerRequestOptimizer.java:29-43`,
  * `OptimizationFlags.java:69-113`):
  *
  *  - requests carry `debugOptions` (`;`-separated `k=v` pairs,
  *    `BaseBrokerRequestHandler.java:214-218`); the `optimizationFlags`
  *    option is a `,`-list of optimizer names prefixed `+` (enable) or
  *    `-` (disable). Any `+` flips the default to deny-unlisted;
  *    mixing `+` and `-` is rejected (`OptimizationFlags.java:37-40`).
  *  - optimizer names derive from the class names
  *    (`OptimizationFlags.optimizationName`, strips only the
  *    `FilterQueryTreeOptimizer` suffix): `flattenNestedPredicates`,
  *    `multipleOrEqualitiesToInClause`, and — because
  *    `RangeMergeOptimizer` does not carry the suffix —
  *    `rangeMergeOptimizer`. The whole family is additionally gated by
  *    the `filterQueryTree` name (`BrokerRequestOptimizer.java:76-84`).
  *
  * Semantically Catalyst performs equivalent rewrites on the compiled
  * plan, but the reference applies these at the REQUEST level where the
  * effect is user-visible (an IN predicate instead of a 500-way OR
  * chain parses, prints and pushes down differently), so the front-end
  * owns them here too — on the parsed [[Pql.Pred]] tree, before
  * compilation to Catalyst.
  */
object FilterOptimizer {

  val FlattenName = "flattenNestedPredicates"
  val OrToInName = "multipleOrEqualitiesToInClause"
  val RangeMergeName = "rangeMergeOptimizer"
  val GroupName = "filterQueryTree"

  /** `OptimizationFlags`: at most one of the sets is non-empty. */
  final case class Flags(enabled: Set[String], disabled: Set[String]) {
    require(enabled.isEmpty || disabled.isEmpty,
      "Cannot exclude and include optimizations at the same time")
    def isEnabled(name: String): Boolean =
      if (enabled.isEmpty) !disabled.contains(name) else enabled.contains(name)
  }

  /** Parse `+a,-b` (OptimizationFlags.getOptimizationFlags). */
  def parseFlags(s: String): Flags = {
    val items = s.split(',').map(_.trim).filter(_.nonEmpty)
    val enabled = Set.newBuilder[String]
    val disabled = Set.newBuilder[String]
    items.foreach { it =>
      if (it.charAt(0) == '+') enabled += it.substring(1)
      else if (it.charAt(0) == '-') disabled += it.substring(1)
      else throw new IllegalArgumentException(
        s"Optimization flag list contains an invalid value $it, " +
          "should be prefixed either with + or -")
    }
    Flags(enabled.result(), disabled.result())
  }

  /** Parse a `debugOptions` string: `;`-separated `k=v`, trimmed
    * (BaseBrokerRequestHandler.java:215-216). */
  def parseDebugOptions(s: String): Map[String, String] =
    s.split(';').iterator.map(_.trim).filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf('=')
      require(i > 0, s"malformed debug option '$kv' (expected k=v)")
      kv.substring(0, i).trim -> kv.substring(i + 1).trim
    }.toMap

  /** Apply the optimizer chain to a filter tree under the given flags
    * (None = no `optimizationFlags` debug option = all enabled). */
  def optimize(p: Pred, timeColumn: Option[String], flags: Option[Flags]): Pred = {
    def on(name: String): Boolean = flags match {
      case None => true
      case Some(f) => f.isEnabled(GroupName) && f.isEnabled(name)
    }
    var cur = p
    if (on(FlattenName)) cur = flatten(cur, MaxFlattenDepth)
    if (on(OrToInName)) cur = orToIn(cur)
    if (on(RangeMergeName)) timeColumn.foreach(tc => cur = rangeMerge(cur, tc))
    cur
  }

  // ---- flattenNestedPredicates ----------------------------------------

  /** FlattenNestedPredicatesFilterQueryTreeOptimizer.MAX_OPTIMIZING_DEPTH */
  val MaxFlattenDepth = 5

  /** AND(a, AND(b, c)) → AND(a, b, c); same for OR; recursion depth
    * capped like the reference. */
  def flatten(p: Pred, depth: Int = MaxFlattenDepth): Pred = p match {
    case AndP(ps) if depth > 0 =>
      AndP(ps.map(flatten(_, depth - 1)).flatMap {
        case AndP(cs) => cs
        case other => Seq(other)
      })
    case OrP(ps) if depth > 0 =>
      OrP(ps.map(flatten(_, depth - 1)).flatMap {
        case OrP(cs) => cs
        case other => Seq(other)
      })
    case other => other
  }

  // ---- multipleOrEqualitiesToInClause ---------------------------------

  /** Literal identity key: numerics compare by numeric value (1 = 1.0),
    * strings by content — the analog of the reference's string-valued
    * TreeSet. */
  private def litKey(e: Expr): Option[String] = e match {
    case NumLit(v) => Some("n:" + v.underlying.stripTrailingZeros.toPlainString)
    case StrLit(v) => Some("s:" + v)
    case _ => None
  }

  /** OR(a=1, a=2, a IN (3)) → a IN (1, 2, 3); single surviving value →
    * equality; non-equality children are kept as siblings untouched
    * (`MultipleOrEqualitiesToInClauseFilterQueryTreeOptimizer.java:43-71`
    * — the reference does not descend into an OR's non-equality
    * children, only into children of non-OR nodes; reproduced). */
  def orToIn(p: Pred): Pred = p match {
    case OrP(children) =>
      // collect EQ / positive-IN children per column expression
      val order = scala.collection.mutable.LinkedHashMap
        .empty[Expr, scala.collection.mutable.LinkedHashMap[String, Expr]]
      val others = Seq.newBuilder[Pred]
      var dupes = false
      var collected = 0
      children.foreach {
        case Cmp(e, "=", v) if litKey(v).isDefined =>
          val m = order.getOrElseUpdate(e,
            scala.collection.mutable.LinkedHashMap.empty)
          if (m.put(litKey(v).get, v).isDefined) dupes = true
          collected += 1
        case In(e, vals, false) if vals.forall(litKey(_).isDefined) =>
          val m = order.getOrElseUpdate(e,
            scala.collection.mutable.LinkedHashMap.empty)
          vals.foreach(v => if (m.put(litKey(v).get, v).isDefined) dupes = true)
          collected += 1
        case other => others += other
      }
      val nonEq = others.result()
      if (order.isEmpty) p
      else {
        def rebuilt(e: Expr, vals: Seq[Expr]): Pred =
          if (vals.size == 1) Cmp(e, "=", vals.head)
          else In(e, vals, negated = false)
        if (order.size == 1 && nonEq.isEmpty)
          rebuilt(order.head._1, order.head._2.values.toSeq)
        else if (!dupes && order.valuesIterator.forall(_.size == 1) &&
            collected == order.size)
          p // nothing to merge — return the tree unchanged
        else
          OrP(order.map { case (e, m) => rebuilt(e, m.values.toSeq) }.toSeq ++ nonEq)
      }
    case AndP(ps) => AndP(ps.map(orToIn))
    case other => other
  }

  // ---- rangeMergeOptimizer --------------------------------------------

  private final case class Interval(
      lo: Option[(BigDecimal, Boolean)], // (bound, inclusive)
      hi: Option[(BigDecimal, Boolean)])

  private def asTimeRange(p: Pred, timeCol: String): Option[Interval] = p match {
    case Cmp(Ident(c), op, NumLit(v)) if c == timeCol => op match {
      case ">" => Some(Interval(Some((v, false)), None))
      case ">=" => Some(Interval(Some((v, true)), None))
      case "<" => Some(Interval(None, Some((v, false))))
      case "<=" => Some(Interval(None, Some((v, true))))
      case _ => None
    }
    case Between(Ident(c), NumLit(lo), NumLit(hi)) if c == timeCol =>
      Some(Interval(Some((lo, true)), Some((hi, true))))
    case _ => None
  }

  private def intersect(a: Interval, b: Interval): Interval = {
    def tighterLo(x: (BigDecimal, Boolean), y: (BigDecimal, Boolean)) =
      if (x._1 > y._1) x else if (y._1 > x._1) y else (x._1, x._2 && y._2)
    def tighterHi(x: (BigDecimal, Boolean), y: (BigDecimal, Boolean)) =
      if (x._1 < y._1) x else if (y._1 < x._1) y else (x._1, x._2 && y._2)
    Interval(
      (a.lo, b.lo) match {
        case (Some(x), Some(y)) => Some(tighterLo(x, y))
        case (x, y) => x.orElse(y)
      },
      (a.hi, b.hi) match {
        case (Some(x), Some(y)) => Some(tighterHi(x, y))
        case (x, y) => x.orElse(y)
      })
  }

  private def fromInterval(timeCol: String, iv: Interval): Pred = iv match {
    case Interval(Some((lo, true)), Some((hi, true))) =>
      Between(Ident(timeCol), NumLit(lo), NumLit(hi))
    case Interval(lo, hi) =>
      val parts =
        lo.map { case (v, inc) => Cmp(Ident(timeCol), if (inc) ">=" else ">", NumLit(v)) }.toSeq ++
          hi.map { case (v, inc) => Cmp(Ident(timeCol), if (inc) "<=" else "<", NumLit(v)) }
      if (parts.size == 1) parts.head else AndP(parts)
  }

  /** Intersect conjunctive range predicates on the time column
    * (`RangeMergeOptimizer.optimizeRanges`: ORs optimize children
    * without pull-up; ANDs fold every time-column range into one
    * interval and keep the rest as siblings; an AND of only time
    * ranges collapses to the single merged range). An empty
    * intersection yields an unsatisfiable bound pair — matching the
    * reference, which emits the empty range rather than a constant
    * false. */
  def rangeMerge(p: Pred, timeCol: String): Pred = p match {
    case OrP(ps) => OrP(ps.map(rangeMerge(_, timeCol)))
    case AndP(ps) =>
      val opt = ps.map(rangeMerge(_, timeCol))
      val ranges = opt.flatMap(asTimeRange(_, timeCol))
      if (ranges.size <= 1) AndP(opt)
      else {
        val others = opt.filter(asTimeRange(_, timeCol).isEmpty)
        val merged = fromInterval(timeCol, ranges.reduce(intersect))
        if (others.isEmpty) merged else AndP(others :+ merged)
      }
    case other => other
  }
}
