package graft.pql

import org.apache.spark.sql.DataFrame

/** Query-result sink: renders a translated PQL result in the
  * reference's broker response JSON shape
  * (`pinot-common/.../response/broker/BrokerResponseNative.java` +
  * `SelectionResults` / `AggregationResult` / `GroupByResult`):
  *
  *  - selection → `{"selectionResults": {"columns": [...],
  *    "results": [[...], ...]}}`
  *  - plain aggregation → `{"aggregationResults": [{"function": f,
  *    "value": "..."}]}`
  *  - group-by → one `aggregationResults` entry per function with
  *    `groupByColumns` and `groupByResult: [{"group": [keys],
  *    "value": "..."}]`
  *
  * Values serialize as strings by default, as the reference does; the
  * `preserveType` query option keeps native JSON types instead
  * (`BrokerReduceService.java:183-186`,
  * `CommonConstants.Broker.Request.QueryOptionKey.PRESERVE_TYPE`).
  * This is a RESPONSE-sized collect (bounded by LIMIT/TOP, like the
  * broker's own materialization) — never a data-sized one.
  */
object BrokerResponse {

  private def js(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def typedCell(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case n @ (_: Byte | _: Short | _: Int | _: Long) => n.toString
    case d: Double if !d.isNaN && !d.isInfinite => d.toString
    case f: Float if !f.isNaN && !f.isInfinite => f.toString
    case n: java.math.BigDecimal => n.toString
    case seq: scala.collection.Seq[_] =>
      seq.map(typedCell).mkString("[", ",", "]")
    case other => js(String.valueOf(other))
  }

  /** Render the result of `Pql.toDataFrame(q, ...)` for query `q`.
    * `preserveType = false` stringifies every value (the reference's
    * default); `true` emits native JSON numbers/booleans/nulls. */
  def render(q: Pql.Query, df: DataFrame): String =
    render(q, df, preserveType = false)

  /** The reference's `trace` query option (`TraceContext` per-operator
    * logs surfaced as `BrokerResponseNative.traceInfo`, a map of
    * String→String): after execution, each physical operator reports
    * its SQL metrics (rows, timings, spill/shuffle sizes) keyed by
    * plan position + node name — Spark's operator metrics are the
    * native analogue of the reference's per-operator trace entries. */
  def render(q: Pql.Query, df: DataFrame, preserveType: Boolean,
      trace: Boolean): String = {
    val body = render(q, df, preserveType)
    if (!trace) body
    else {
      val entries = flattenPlan(df.queryExecution.executedPlan).zipWithIndex.map {
        case (node, i) =>
          val metrics = node.metrics.toSeq.sortBy(_._1).collect {
            case (k, m) if m.value > 0 => s"$k=${m.value}"
          }
          s"${js(s"$i:${node.nodeName}")}: ${js(metrics.mkString(", "))}"
      }
      body.dropRight(1) +
        s""", "traceInfo": ${entries.mkString("{", ",", "}")}}"""
    }
  }

  /** Physical operators in plan order, walked THROUGH adaptive
    * wrappers and materialized query stages — the final (re-planned)
    * operators hold the execution metrics. */
  private def flattenPlan(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    p match {
      case a: AdaptiveSparkPlanExec => a +: flattenPlan(a.executedPlan)
      case s: QueryStageExec => s +: flattenPlan(s.plan)
      case other => other +: other.children.flatMap(flattenPlan)
    }
  }

  /** `numDocsScanned` for aggregation responses
    * (`BrokerResponseNative`'s execution stats): total output rows of
    * the scan operators of the EXECUTED plan — the docs the engine
    * actually read after segment/row-group pruning. */
  private def docsScanned(df: DataFrame): Long =
    flattenPlan(df.queryExecution.executedPlan)
      .filter(_.nodeName.startsWith("Scan"))
      .flatMap(_.metrics.get("numOutputRows").map(_.value))
      .sum

  def render(q: Pql.Query, df: DataFrame, preserveType: Boolean): String = {
    val cell: Any => String =
      if (preserveType) typedCell else (v => js(String.valueOf(v)))
    val rows = df.collect()
    val cols = df.columns

    if (!Pql.isAggregationQuery(q)) {
      val results = rows.map(r =>
        cols.indices.map(i => cell(r.get(i))).mkString("[", ",", "]"))
        .mkString("[", ",", "]")
      s"""{"selectionResults": {"columns": ${cols.map(js).mkString("[", ",", "]")}, "results": $results}, "numDocsScanned": ${rows.length}}"""
    } else if (q.groupBy.isEmpty) {
      val r = rows.head
      val aggs = cols.zipWithIndex.map { case (c, i) =>
        s"""{"function": ${js(c)}, "value": ${cell(r.get(i))}}"""
      }.mkString("[", ",", "]")
      s"""{"aggregationResults": $aggs, "numDocsScanned": ${docsScanned(df)}}"""
    } else {
      val keyIdx = q.groupBy.indices
      val nKeys = q.groupBy.length
      val gbCols = cols.take(nKeys).map(js).mkString("[", ",", "]")
      val aggs = cols.drop(nKeys).zipWithIndex.map { case (c, j) =>
        val groups = rows.map { r =>
          val ks = keyIdx.map(i => cell(r.get(i))).mkString("[", ",", "]")
          s"""{"group": $ks, "value": ${cell(r.get(nKeys + j))}}"""
        }.mkString("[", ",", "]")
        s"""{"function": ${js(c)}, "groupByColumns": $gbCols, "groupByResult": $groups}"""
      }.mkString("[", ",", "]")
      s"""{"aggregationResults": $aggs, "numDocsScanned": ${docsScanned(df)}}"""
    }
  }

}
