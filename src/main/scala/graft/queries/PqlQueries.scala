package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, round, split}
import graft.pql.Pql
import graft.sources.Tables

/** The PQL front-end exercised over every documented query shape
  * (`docs/pql_examples.rst`, grammar `PQL2.g4:21-115`) with DuckDB
  * oracles. Each entry is a PQL STRING compiled by [[graft.pql.Pql]] —
  * proving the parser + translator path end-to-end, not hand-built
  * DataFrames.
  *
  * Oracle-parity notes: PQL result columns are named
  * `<fn>_<args>` (`count_star`, `sum_l_quantity`), grouping keys
  * appear in results, `GROUP BY ... TOP n` orders by the first
  * aggregation desc with group keys as tiebreak. Numeric aggregations
  * stick to integral-valued columns (quantities, keys) so unrounded
  * double sums are bit-identical across engines.
  */
object PqlQueries {

  private val pql: Map[String, String] = Map(
    "q_pql_count" ->
      "SELECT COUNT(*) FROM lineitem",
    "q_pql_agg" ->
      "SELECT COUNT(*), MAX(l_quantity), SUM(l_quantity) FROM lineitem",
    "q_pql_groupby" ->
      """SELECT MIN(l_quantity), MAX(l_quantity), SUM(l_quantity), AVG(l_quantity)
        |FROM lineitem GROUP BY l_returnflag, l_linestatus TOP 50""".stripMargin,
    "q_pql_filter" ->
      """SELECT COUNT(*) FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity BETWEEN 1 AND 20
        |OR (l_suppkey < 42 AND l_linestatus IN ('F', 'O') AND l_linenumber NOT IN (42, 69))""".stripMargin,
    "q_pql_select" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |WHERE n_nationkey < 15 ORDER BY n_nationkey LIMIT 50""".stripMargin,
    "q_pql_page" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 1000 ORDER BY o_totalprice DESC, o_orderkey LIMIT 20, 30""".stripMargin,
    "q_pql_regexp" ->
      """SELECT COUNT(*) FROM part
        |WHERE REGEXP_LIKE(p_type, '^PROMO') GROUP BY p_brand TOP 10""".stripMargin,
    "q_pql_range_dc" ->
      """SELECT MINMAXRANGE(l_quantity), DISTINCTCOUNT(l_suppkey)
        |FROM lineitem GROUP BY l_returnflag TOP 10""".stripMargin,
    "q_pql_udf_group" ->
      "SELECT COUNT(*) FROM orders GROUP BY div(o_custkey, 100) TOP 20",
    "q_pql_timeconvert" ->
      "SELECT COUNT(*) FROM orders GROUP BY timeconvert(o_orderkey, 'SECONDS', 'MINUTES') TOP 15",
    "q_pql_having" ->
      "SELECT COUNT(*) FROM orders GROUP BY o_orderpriority HAVING COUNT(*) > 100 TOP 10",
    "q_pql_arith" ->
      """SELECT l_orderkey, l_linenumber, add(l_quantity, l_linenumber) FROM lineitem
        |WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "q_pql_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus LIMIT 20""".stripMargin,
    // r6: integral-column percentiles — the exact-histogram routing
    // (Pql histFrames): PERCENTILE = interpolated double, identical to
    // quantile_cont; PERCENTILEEST = exact nearest-rank LONG, which
    // DuckDB's quantile_disc reproduces value-for-value (verified:
    // both pick the value at 1-indexed rank max(ceil(f*n), 1))
    "q_pql_percentile" ->
      """SELECT PERCENTILE50(l_linenumber), PERCENTILEEST50(l_linenumber),
        |PERCENTILEEST90(l_linenumber), COUNT(*)
        |FROM lineitem GROUP BY l_returnflag TOP 10""".stripMargin,
    // round-4 grammar tail: backtick identifiers, IS [NOT] NULL
    // evaluated (not parse-and-ignore), OPTION(...) carried as
    // advisory — one query exercising all three through the oracle
    "q_pql_isnull" ->
      """SELECT COUNT(*), MAX(`o_totalprice`) FROM orders
        |WHERE `o_orderstatus` IS NOT NULL AND o_orderpriority IS NOT NULL
        |OPTION(preserveType=true, timeoutMs=10000)""".stripMargin)

  /** MV aggregation twins (COUNTMV..MINMAXRANGEMV,
    * `AggregationFunctionFactory.java`) mixed with an SV COUNT(*) in
    * one query — proving the explode_outer sub-aggregation join path.
    * Float-derived outputs are rounded AFTER the TOP sort (which is on
    * the integral COUNTMV) for cross-engine sum-order parity; the
    * oracle rounds identically. */
  private val pqlMvAgg =
    """SELECT COUNTMV(embedding), DISTINCTCOUNTMV(embedding), MINMV(embedding),
      |MAXMV(embedding), SUMMV(embedding), AVGMV(embedding), MINMAXRANGEMV(embedding),
      |COUNT(*) FROM embeddings GROUP BY label TOP 10""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    pql.map { case (name, q) =>
      name -> ((s: SparkSession, dir: String) => Pql.run(s, dir, q))
    } + ("q_pql_valuein" -> ((s: SparkSession, dir: String) => {
      // VALUEIN needs an MV column; documents carries none raw, so the
      // resolver derives `words` = whitespace-split text (the same
      // derivation the ingest record-transformer would declare)
      val resolver: String => DataFrame = {
        case "documents" =>
          Tables.load(s, dir, "documents").withColumn("words", split(col("text"), " "))
        case other => Tables.load(s, dir, other)
      }
      Pql.toDataFrame(Pql.parse(
        "SELECT COUNT(*) FROM documents " +
          "GROUP BY VALUEIN(words, 'scan', 'join', 'filter', 'the') TOP 10"), resolver)
    })) + ("q_pql_percentile_rank" -> ((s: SparkSession, dir: String) =>
      // r9: the rankSelect PQL routing — GLOBAL exact PERCENTILE over
      // a wide double column (near-unique values) compiles to
      // Percentiles.rankSelect (distributed quickselect) instead of
      // the per-group value-buffer `percentile()`; same quantile_cont
      // semantics, no full-width shuffle (asserted in PqlSpec).
      // Rounded AFTER the PQL frame for cross-engine hash parity.
      Pql.run(s, dir,
          """SELECT PERCENTILE50(l_extendedprice), PERCENTILE95(l_extendedprice)
            |FROM lineitem WHERE l_quantity > 5""".stripMargin)
        .select(
          round(col("percentile50_l_extendedprice"), 3)
            .as("percentile50_l_extendedprice"),
          round(col("percentile95_l_extendedprice"), 3)
            .as("percentile95_l_extendedprice")))
    ) + ("q_pql_percentile_rank_grouped" -> ((s: SparkSession, dir: String) =>
      // r9: GROUPED exact PERCENTILE over the same wide double column
      // compiles to Percentiles.rankSelectKeyed — group keys fold into
      // the narrowing cells, all groups share the ~3 counting scans
      // (probed 8.4 s vs 38.5 s for the grouped histogram at 100M
      // rows × 2 groups); previously this shape paid the per-group
      // value-buffer `percentile()`.
      Pql.run(s, dir,
          """SELECT PERCENTILE50(l_extendedprice), PERCENTILE95(l_extendedprice)
            |FROM lineitem GROUP BY l_returnflag TOP 10""".stripMargin)
        .select(
          col("l_returnflag"),
          round(col("percentile50_l_extendedprice"), 3)
            .as("percentile50_l_extendedprice"),
          round(col("percentile95_l_extendedprice"), 3)
            .as("percentile95_l_extendedprice")))
    ) + ("q_pql_mv_agg" -> ((s: SparkSession, dir: String) =>
      Pql.run(s, dir, pqlMvAgg).select(
        col("label"),
        col("countmv_embedding"),
        col("distinctcountmv_embedding"),
        round(col("minmv_embedding").cast("double"), 4).as("minmv_embedding"),
        round(col("maxmv_embedding").cast("double"), 4).as("maxmv_embedding"),
        round(col("summv_embedding").cast("double"), 4).as("summv_embedding"),
        round(col("avgmv_embedding").cast("double"), 4).as("avgmv_embedding"),
        round(col("minmaxrangemv_embedding").cast("double"), 4).as("minmaxrangemv_embedding"),
        col("count_star"))))

  val oracles: Map[String, String] = Map(
    // unnest(list_filter(...)) = explode(filter(...)): duplicates
    // retained on both sides; TOP 10 = count desc, key asc tiebreak
    "q_pql_valuein" ->
      """SELECT word AS valuein_words_scan_join_filter_the,
        |  count(*) AS count_star
        |FROM (SELECT unnest(list_filter(string_split(text, ' '),
        |    w -> w IN ('scan','join','filter','the'))) AS word
        |  FROM documents)
        |GROUP BY 1 ORDER BY count_star DESC, 1 LIMIT 10""".stripMargin,
    "q_pql_count" ->
      "SELECT count(*) AS count_star FROM lineitem",
    "q_pql_agg" ->
      """SELECT count(*) AS count_star, max(l_quantity) AS max_l_quantity,
        |  sum(l_quantity) AS sum_l_quantity FROM lineitem""".stripMargin,
    "q_pql_groupby" ->
      """SELECT l_returnflag, l_linestatus,
        |  min(l_quantity) AS min_l_quantity, max(l_quantity) AS max_l_quantity,
        |  sum(l_quantity) AS sum_l_quantity, avg(l_quantity) AS avg_l_quantity
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY min_l_quantity DESC, l_returnflag, l_linestatus LIMIT 50""".stripMargin,
    "q_pql_filter" ->
      """SELECT count(*) AS count_star FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity BETWEEN 1 AND 20
        |OR (l_suppkey < 42 AND l_linestatus IN ('F', 'O') AND l_linenumber NOT IN (42, 69))""".stripMargin,
    "q_pql_select" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |WHERE n_nationkey < 15 ORDER BY n_nationkey LIMIT 50""".stripMargin,
    "q_pql_page" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 1000 ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 30 OFFSET 20""".stripMargin,
    "q_pql_regexp" ->
      """SELECT p_brand, count(*) AS count_star FROM part
        |WHERE regexp_matches(p_type, '^PROMO')
        |GROUP BY p_brand ORDER BY count_star DESC, p_brand LIMIT 10""".stripMargin,
    "q_pql_range_dc" ->
      """SELECT l_returnflag,
        |  max(l_quantity) - min(l_quantity) AS minmaxrange_l_quantity,
        |  count(DISTINCT l_suppkey) AS distinctcount_l_suppkey
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY minmaxrange_l_quantity DESC, l_returnflag LIMIT 10""".stripMargin,
    "q_pql_udf_group" ->
      """SELECT CAST(o_custkey AS DOUBLE) / 100 AS div_o_custkey_100,
        |  count(*) AS count_star
        |FROM orders GROUP BY 1 ORDER BY count_star DESC, div_o_custkey_100 LIMIT 20""".stripMargin,
    "q_pql_timeconvert" ->
      """SELECT o_orderkey // 60 AS timeconvert_o_orderkey_seconds_minutes,
        |  count(*) AS count_star
        |FROM orders GROUP BY 1
        |ORDER BY count_star DESC, timeconvert_o_orderkey_seconds_minutes LIMIT 15""".stripMargin,
    "q_pql_having" ->
      """SELECT o_orderpriority, count(*) AS count_star FROM orders
        |GROUP BY o_orderpriority HAVING count(*) > 100
        |ORDER BY count_star DESC, o_orderpriority LIMIT 10""".stripMargin,
    "q_pql_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(CAST(l_linenumber AS DOUBLE), 0.5) AS percentile50_l_linenumber,
        |  CAST(quantile_disc(l_linenumber, 0.5) AS BIGINT) AS percentileest50_l_linenumber,
        |  CAST(quantile_disc(l_linenumber, 0.9) AS BIGINT) AS percentileest90_l_linenumber,
        |  count(*) AS count_star
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY percentile50_l_linenumber DESC, l_returnflag LIMIT 10""".stripMargin,
    "q_pql_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_quantity + l_linenumber AS add_l_quantity_l_linenumber
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "q_pql_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus LIMIT 20""".stripMargin,
    "q_pql_isnull" ->
      """SELECT count(*) AS count_star, max(o_totalprice) AS max_o_totalprice
        |FROM orders
        |WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL""".stripMargin,
    "q_pql_percentile_rank" ->
      """SELECT
        |  round(quantile_cont(l_extendedprice, 0.5), 3) AS percentile50_l_extendedprice,
        |  round(quantile_cont(l_extendedprice, 0.95), 3) AS percentile95_l_extendedprice
        |FROM lineitem WHERE l_quantity > 5""".stripMargin,
    "q_pql_percentile_rank_grouped" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 3) AS percentile50_l_extendedprice,
        |  round(quantile_cont(l_extendedprice, 0.95), 3) AS percentile95_l_extendedprice
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // unnest = explode; float min/max/range use float arithmetic in
    // both engines (bit-identical) before the widening round; sum/avg
    // widen per-element to double then round away the order difference
    "q_pql_mv_agg" ->
      """WITH sv AS (
        |  SELECT label, count(*) AS count_star FROM embeddings GROUP BY label
        |), mv AS (
        |  SELECT label,
        |    count(e) AS countmv_embedding,
        |    count(DISTINCT e) AS distinctcountmv_embedding,
        |    round(CAST(min(e) AS DOUBLE), 4) AS minmv_embedding,
        |    round(CAST(max(e) AS DOUBLE), 4) AS maxmv_embedding,
        |    round(CAST(sum(CAST(e AS DOUBLE)) AS DOUBLE), 4) AS summv_embedding,
        |    round(CAST(avg(CAST(e AS DOUBLE)) AS DOUBLE), 4) AS avgmv_embedding,
        |    round(CAST(max(e) - min(e) AS DOUBLE), 4) AS minmaxrangemv_embedding
        |  FROM (SELECT label, unnest(embedding) AS e FROM embeddings) GROUP BY label
        |)
        |SELECT sv.label, mv.countmv_embedding, mv.distinctcountmv_embedding,
        |  mv.minmv_embedding, mv.maxmv_embedding, mv.summv_embedding,
        |  mv.avgmv_embedding, mv.minmaxrangemv_embedding, sv.count_star
        |FROM sv JOIN mv USING(label)
        |ORDER BY countmv_embedding DESC, label LIMIT 10""".stripMargin)
}
