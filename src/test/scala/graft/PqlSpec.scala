package graft

import org.apache.spark.sql.functions._
import graft.pql.Pql

class PqlSpec extends SparkSpec {
  import spark.implicits._

  private def run(q: String) = Pql.run(spark, sfDir, q)

  test("parser: AST for the documented grammar shapes") {
    val q = Pql.parse(
      "SELECT COUNT(*), SUM(bar) FROM t WHERE foo = 'x' AND bar BETWEEN 1 AND 20 " +
        "OR (baz < 42 AND quux IN ('a', 'b') AND q2 NOT IN (42, 69)) " +
        "GROUP BY dim TOP 7 HAVING COUNT(*) > 3")
    assert(q.table === "t")
    assert(q.select === Seq(Pql.Func("count", Seq(Pql.Star)),
      Pql.Func("sum", Seq(Pql.Ident("bar")))))
    assert(q.groupBy === Seq(Pql.Ident("dim")))
    assert(q.top === Some(7))
    assert(q.having.isDefined)
    // OR at top level: (foo='x' AND between) OR (parenthesised AND-chain)
    q.where.get match {
      case Pql.OrP(Seq(Pql.AndP(_), Pql.AndP(ps))) => assert(ps.length === 3)
      case other => fail(s"unexpected predicate tree: $other")
    }
  }

  test("parser rejects malformed queries with clear errors") {
    intercept[IllegalArgumentException](Pql.parse("SELECT FROM t"))
    intercept[IllegalArgumentException](Pql.parse("SELECT a FROM t WHERE a ~ 3"))
    intercept[IllegalArgumentException](Pql.parse("SELECT a FROM t LIMIT x"))
    intercept[IllegalArgumentException](Pql.parse("SELECT a FROM"))
    // ORDER BY on aggregation is a PQL error (use TOP)
    intercept[IllegalArgumentException](
      run("SELECT COUNT(*) FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"))
    // malformed number: one clear lexer error, not a late crash
    val numErr = intercept[IllegalArgumentException](
      Pql.parse("SELECT a FROM t WHERE a = 1.2.3"))
    assert(numErr.getMessage.contains("malformed number"))
    // group-by whose only aggregation hides in HAVING: clear reject,
    // not NoSuchElementException from the TOP ordering
    val havErr = intercept[IllegalArgumentException](
      run("SELECT n_regionkey FROM nation GROUP BY n_regionkey HAVING COUNT(*) > 3"))
    assert(havErr.getMessage.contains("at least one aggregation"))
  }

  test("IS [NOT] NULL, OPTION(...), and backtick identifiers parse and evaluate") {
    val q = Pql.parse("SELECT `n_name` FROM nation WHERE n_comment IS NOT NULL " +
      "LIMIT 30 OPTION(preserveType=true, timeoutMs=100)")
    assert(q.select === Seq(Pql.Ident("n_name")))
    assert(q.where === Some(Pql.IsNull(Pql.Ident("n_comment"), negated = true)))
    assert(q.options === Map("preserveType" -> "true", "timeoutMs" -> "100"))
    // engine path: IS NULL evaluates (not parse-and-ignore)
    val total = run("SELECT COUNT(*) FROM nation").as[Long].head()
    val notNull = run("SELECT COUNT(*) FROM nation WHERE n_name IS NOT NULL LIMIT 100")
      .as[Long].head()
    val isNull = run("SELECT COUNT(*) FROM nation WHERE n_name IS NULL LIMIT 100")
      .as[Long].head()
    assert(notNull + isNull === total)
    assert(notNull === total, "testdata nation.n_name has no nulls")
  }

  test("SELECT * and default selection LIMIT 10") {
    val out = run("SELECT * FROM lineitem")
    assert(out.count() === 10)
    assert(out.columns.length ===
      graft.sources.Tables.load(spark, sfDir, "lineitem").columns.length)
  }

  test("aggregation with no GROUP BY returns one row with PQL names") {
    val out = run("SELECT COUNT(*), MINMAXRANGE(l_quantity) FROM lineitem")
    assert(out.columns.toSeq === Seq("count_star", "minmaxrange_l_quantity"))
    assert(out.count() === 1)
  }

  test("PERCENTILE50 matches the DataFrame percentile") {
    val got = run("SELECT PERCENTILE50(l_quantity) FROM lineitem")
      .as[Double].head()
    val want = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .agg(percentile($"l_quantity", lit(0.5))).as[Double].head()
    assert(got === want)
  }

  test("GROUP BY TOP orders by first aggregation desc, keys as tiebreak") {
    val rows = run("SELECT COUNT(*) FROM lineitem GROUP BY l_linenumber TOP 3")
      .select("count_star").as[Long].collect().toSeq
    assert(rows === rows.sorted.reverse, s"not descending: $rows")
    assert(rows.length === 3)
  }

  test("MV group-by explodes array keys (one group entry per element)") {
    val df = Seq(
      (Seq("a", "b"), 1.0), (Seq("a"), 2.0), (Seq("b", "c"), 3.0)
    ).toDF("tags", "v")
    val out = Pql.toDataFrame(
        Pql.parse("SELECT SUM(v) FROM t GROUP BY tags TOP 10"), _ => df)
      .as[(String, Double)].collect().toMap
    assert(out === Map("a" -> 3.0, "b" -> 4.0, "c" -> 3.0))
    // MV predicate: any element matches
    val cnt = Pql.toDataFrame(
        Pql.parse("SELECT COUNT(*) FROM t WHERE tags = 'b'"), _ => df)
      .as[Long].head()
    assert(cnt === 2L)
  }

  test("MV aggregation twins: element semantics, SV aggregations undistorted") {
    val df = Seq(
      (1, Seq(1, 2, 2)), (1, Seq(4)), (2, Seq.empty[Int]), (2, Seq(7, 8))
    ).toDF("g", "vals")
    val out = Pql.toDataFrame(Pql.parse(
      "SELECT COUNTMV(vals), SUMMV(vals), MINMV(vals), MAXMV(vals), AVGMV(vals), " +
        "DISTINCTCOUNTMV(vals), MINMAXRANGEMV(vals), COUNT(*) FROM t GROUP BY g TOP 10"),
      _ => df)
    assert(out.columns.toSeq === Seq("g", "countmv_vals", "summv_vals", "minmv_vals",
      "maxmv_vals", "avgmv_vals", "distinctcountmv_vals", "minmaxrangemv_vals", "count_star"))
    val rows = out.collect().map(r => r.getInt(0) ->
      (r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4), r.getDouble(5),
        r.getLong(6), r.getInt(7), r.getLong(8))).toSeq
    // TOP orders by the first aggregation (COUNTMV) desc: g=1 (4 elems) first
    assert(rows.map(_._1) === Seq(1, 2))
    assert(rows.toMap === Map(
      1 -> ((4L, 9L, 1, 4, 2.25, 3L, 3, 2L)),
      // the empty array contributes 0 elements but the entry still counts
      2 -> ((2L, 15L, 7, 8, 7.5, 2L, 1, 2L))))
    // global (no GROUP BY): MV + SV mix in one row
    val one = Pql.toDataFrame(
      Pql.parse("SELECT SUMMV(vals), COUNT(*) FROM t"), _ => df).collect().head
    assert((one.getLong(0), one.getLong(1)) === ((24L, 4L)))
    // HAVING over an MV aggregation hidden from the select list
    val hav = Pql.toDataFrame(Pql.parse(
      "SELECT COUNT(*) FROM t GROUP BY g HAVING MAXMV(vals) >= 5 TOP 10"), _ => df)
    assert(hav.columns.toSeq === Seq("g", "count_star"))
    assert(hav.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq === Seq((2, 2L)))
  }

  test("IS NULL on an MV column: empty and absent cells both match") {
    val df = Seq(
      (1, Option(Seq(1, 2))), (2, Option(Seq.empty[Int])), (3, Option.empty[Seq[Int]])
    ).toDF("id", "vals")
    def cnt(q: String): Long =
      Pql.toDataFrame(Pql.parse(q), _ => df).as[Long].head()
    assert(cnt("SELECT COUNT(*) FROM t WHERE vals IS NULL") === 2L)
    assert(cnt("SELECT COUNT(*) FROM t WHERE vals IS NOT NULL") === 1L)
  }

  test("FASTHLL aggregates a pre-built sketch column by union") {
    // the ingest-derived sketch metric (FastHLLAggregationFunction):
    // per-group partial sketches, then PQL FASTHLL unions them
    val sketches = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .groupBy($"l_returnflag", $"l_suppkey")
      .agg(hll_sketch_agg($"l_partkey", lit(8)).as("sk"))
    val got = Pql.toDataFrame(
        Pql.parse("SELECT FASTHLL(sk) FROM t GROUP BY l_returnflag TOP 10"),
        _ => sketches)
      .orderBy("l_returnflag")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = sketches.groupBy($"l_returnflag")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("dc"))
      .orderBy("l_returnflag")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("broker response renders the three reference result shapes") {
    import graft.pql.BrokerResponse
    def render(q: String): String = {
      val parsed = Pql.parse(q)
      BrokerResponse.render(parsed, Pql.run(spark, sfDir, q))
    }
    val sel = render("SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 3 ORDER BY n_nationkey LIMIT 5")
    assert(sel.contains(""""selectionResults""""))
    assert(sel.contains(""""columns": ["n_nationkey","n_name"]"""))
    val agg = render("SELECT COUNT(*), MAX(l_quantity) FROM lineitem")
    assert(agg.contains(""""aggregationResults""""))
    assert(agg.contains(""""function": "count_star""""))
    val gby = render("SELECT COUNT(*) FROM lineitem GROUP BY l_returnflag TOP 5")
    assert(gby.contains(""""groupByColumns": ["l_returnflag"]"""))
    assert(gby.contains(""""group": ["""))
    // every render must be valid JSON — parse it back via Spark
    Seq(sel, agg, gby).foreach { j =>
      val parsed = spark.read.json(Seq(j).toDS)
      assert(!parsed.columns.contains("_corrupt_record"), j.take(200))
    }
  }

  test("custom functions resolve from the registry by name + arity") {
    import graft.pql.PqlFunctions
    PqlFunctions.register("strlen", 1)(args => length(args.head))
    val out = run("SELECT COUNT(*) FROM nation GROUP BY strlen(n_name) TOP 30")
    assert(out.columns.toSeq === Seq("strlen_n_name", "count_star"))
    assert(out.count() > 1)
    // unknown function still fails loudly
    intercept[IllegalArgumentException](run("SELECT nope(n_name) FROM nation LIMIT 1"))
  }

  test("HAVING with an aggregation not in the select list") {
    val out = run(
      "SELECT COUNT(*) FROM lineitem GROUP BY l_returnflag HAVING MAX(l_quantity) >= 1 TOP 10")
    assert(out.columns.toSeq === Seq("l_returnflag", "count_star"))
    assert(out.count() > 0)
  }

  test("filterless COUNT(*) answers from parquet footer metadata, zero scans") {
    val df = run("SELECT COUNT(*) FROM lineitem")
    assert(df.columns.toSeq === Seq("count_star"))
    // the plan must be a local relation — no file scan anywhere
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan") && !plan.contains("Scan parquet"), plan)
    // exact agreement with the scan-based count
    val exact = graft.sources.Tables.load(spark, sfDir, "lineitem").count()
    assert(df.as[Long].head() === exact)
    // any filter falls back to the ordinary aggregation path
    val filtered = run("SELECT COUNT(*) FROM lineitem WHERE l_quantity > 0")
    assert(filtered.queryExecution.executedPlan.toString.contains("Scan"))
    // a transformed view (events normalizes ts) falls back too
    val ev = run("SELECT COUNT(*) FROM events")
    assert(ev.as[Long].head() ===
      graft.sources.Tables.load(spark, sfDir, "events").count())
  }

  test("VALUEIN transform: filters MV entries, duplicates retained, MV group-by key") {
    val df = Seq(
      (Seq("a", "b", "a"), 1.0), (Seq("a"), 2.0), (Seq("b", "c"), 3.0), (Seq("z"), 9.0)
    ).toDF("tags", "v")
    // selection: VALUEIN projects the filtered array (duplicates kept)
    val sel = Pql.toDataFrame(
      Pql.parse("SELECT VALUEIN(tags, 'a', 'b') FROM t LIMIT 10"), _ => df)
    assert(sel.columns.toSeq === Seq("valuein_tags_a_b"))
    assert(sel.as[Seq[String]].collect().toSet ===
      Set(Seq("a", "b", "a"), Seq("a"), Seq("b"), Seq()))
    // group-by: one group per RETAINED element; 'c'/'z' never appear,
    // the duplicate 'a' in row 1 counts twice (reference filter-by-
    // dictionary-id semantics, not set intersection)
    val out = Pql.toDataFrame(Pql.parse(
        "SELECT SUM(v), COUNT(*) FROM t GROUP BY VALUEIN(tags, 'a', 'b') TOP 10"), _ => df)
    assert(out.columns.toSeq === Seq("valuein_tags_a_b", "sum_v", "count_star"))
    val rows = out.collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(rows === Map("a" -> ((4.0, 3L)), "b" -> ((4.0, 2L))))
  }

  test("integral-column percentiles route to the exact histogram plan") {
    // l_linenumber is int32 → NO sketch in the plan: both the exact
    // and the EST flavors answer from the distributed value histogram
    val global = run(
      "SELECT PERCENTILEEST50(l_linenumber), PERCENTILE50(l_linenumber) FROM lineitem")
    assert(global.columns.toSeq ===
      Seq("percentileest50_l_linenumber", "percentile50_l_linenumber"))
    val plan = global.queryExecution.optimizedPlan.toString
    assert(!plan.contains("percentile_approx"), s"sketch found in plan:\n$plan")
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
    val exact50 = li.select(percentile($"l_linenumber", lit(0.5)))
      .as[Double].head()
    val row = global.head()
    // exact flavor: identical to percentile(); EST flavor: the actual
    // long value at nearest rank (reference QuantileDigest domain)
    assert(row.getDouble(1) === exact50)
    assert(row.schema(0).dataType.typeName === "long")
    assert(math.abs(row.getLong(0) - exact50) <= 1.0)
    // grouped, mixed with a sketch-path double column and COUNT(*):
    // histogram frame joins back on the group keys; the double column
    // still builds its percentile_approx sketch
    val grouped = run(
      "SELECT PERCENTILE75(l_linenumber), PERCENTILEEST25(l_linenumber), " +
        "PERCENTILEEST50(l_extendedprice), COUNT(*) " +
        "FROM lineitem GROUP BY l_returnflag TOP 10")
    val gplan = grouped.queryExecution.optimizedPlan.toString
    assert("percentile_approx".r.findAllIn(gplan).size === 1,
      s"double column stays on the sketch path:\n$gplan")
    val expect = li.groupBy($"l_returnflag")
      .agg(percentile($"l_linenumber", lit(0.75)).as("p75"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    grouped.collect().foreach { r =>
      val (p75, n) = expect(r.getString(0))
      assert(r.getDouble(1) === p75, s"group ${r.getString(0)}")
      assert(r.getLong(4) === n, s"group ${r.getString(0)}")
    }
    // HAVING over a non-selected histogram-routed percentile: the
    // hidden aggregation computes in the histogram frame and filters
    val having = run(
      "SELECT COUNT(*) FROM lineitem GROUP BY l_returnflag " +
        "HAVING PERCENTILE50(l_linenumber) > 2 TOP 10")
    val p50ByFlag = li.groupBy($"l_returnflag")
      .agg(percentile($"l_linenumber", lit(0.5)).as("p"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val keep = p50ByFlag.filter(_._2._1 > 2)
    assert(having.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      keep.view.mapValues(_._2).toMap)
    // an all-null-value group must still appear, carrying nulls —
    // percentile() inside a wider aggregation keeps the group
    val df = Seq(("a", Some(1), 1.0), ("a", Some(3), 2.0), ("b", None, 3.0))
      .toDF("k", "v", "m")
    val keepNull = Pql.toDataFrame(Pql.parse(
      "SELECT PERCENTILE50(v), PERCENTILEEST50(v), SUM(m) FROM t GROUP BY k TOP 10"), _ => df)
    val rows = keepNull.collect()
      .map(r => r.getString(0) -> ((Option(r.get(1)), Option(r.get(2)), r.getDouble(3)))).toMap
    // est = nearest-rank: value at rank ceil(0.5·2) = 1 → 1
    assert(rows("a") === ((Some(2.0), Some(1L), 3.0)))
    assert(rows("b") === ((None, None, 3.0)))
  }

  test("global exact PERCENTILE over wide columns routes to rankSelect " +
      "(no full-width shuffle, no value-buffer percentile agg)") {
    // r9: l_extendedprice is double (near-unique at scale) → the PQL
    // compiler runs Percentiles.rankSelect eagerly and the RETURNED
    // frame is a local 1-row relation: no Exchange, no `percentile(`
    // buffer aggregate anywhere in what a caller would execute.
    val out = run(
      "SELECT PERCENTILE50(l_extendedprice), PERCENTILE95(l_extendedprice) " +
        "FROM lineitem WHERE l_quantity > 5")
    assert(out.columns.toSeq === Seq(
      "percentile50_l_extendedprice", "percentile95_l_extendedprice"))
    val phys = out.queryExecution.executedPlan.toString
    assert(!phys.contains("Exchange"), s"shuffle in rank-routed plan:\n$phys")
    assert(!phys.contains("percentile("), s"buffer agg in rank-routed plan:\n$phys")
    // values identical to the percentile() formula over the same filter
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .filter($"l_quantity" > 5)
    val Seq((w50, w95)) = li.select(
        percentile($"l_extendedprice", lit(0.5)),
        percentile($"l_extendedprice", lit(0.95)))
      .as[(Double, Double)].collect().toSeq
    val row = out.head()
    assert(row.getDouble(0) === w50)
    assert(row.getDouble(1) === w95)
    // mixed with sketch/plain aggregations: the rank frame crossJoins
    // in and only the OTHER aggregations scan the fact table
    val mixed = run(
      "SELECT COUNT(*), PERCENTILE50(l_extendedprice), MAX(l_quantity) FROM lineitem")
    assert(mixed.columns.toSeq === Seq(
      "count_star", "percentile50_l_extendedprice", "max_l_quantity"))
    val mplan = mixed.queryExecution.optimizedPlan.toString
    assert(!mplan.contains("percentile("), s"buffer agg leaked back:\n$mplan")
    val mrow = mixed.head()
    val want50 = li.sparkSession.read.parquet(s"$sfDir/lineitem.parquet")
      .select(percentile($"l_extendedprice", lit(0.5))).as[Double].head()
    assert(mrow.getDouble(1) === want50)
    // LongType columns (unbounded distinct) route too; int columns
    // keep the histogram (covered by the integral-routing test above)
    val longCol = run("SELECT PERCENTILE50(l_orderkey) FROM lineitem")
    assert(!longCol.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("GROUPED exact PERCENTILE over wide columns routes to rankSelectKeyed " +
      "(local result frame, no value-buffer percentile agg)") {
    // r9: group keys fold into the narrowing cells — the compiler runs
    // Percentiles.rankSelectKeyed eagerly; the executed plan joins a
    // LOCAL ≤G-row frame, with no `percentile(` buffer aggregate
    val out = run(
      "SELECT PERCENTILE50(l_extendedprice), PERCENTILE95(l_extendedprice) " +
        "FROM lineitem GROUP BY l_returnflag TOP 10")
    assert(out.columns.toSeq === Seq("l_returnflag",
      "percentile50_l_extendedprice", "percentile95_l_extendedprice"))
    val phys = out.queryExecution.executedPlan.toString
    assert(!phys.contains("percentile("), s"buffer agg in keyed-routed plan:\n$phys")
    assert(!phys.contains("lineitem.parquet"),
      s"keyed-routed plan should not rescan the fact table:\n$phys")
    // values identical to the percentile() formula per group
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
    val want = li.groupBy($"l_returnflag")
      .agg(percentile($"l_extendedprice", lit(0.5)).as("p50"),
        percentile($"l_extendedprice", lit(0.95)).as("p95"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    out.collect().foreach { r =>
      val (w50, w95) = want(r.getString(0))
      assert(r.getDouble(1) === w50, s"p50 @ ${r.getString(0)}")
      assert(r.getDouble(2) === w95, s"p95 @ ${r.getString(0)}")
    }
    // mixed with plain aggregations: the keyed frame joins back on the
    // group key; the other aggregations still scan the fact table
    val mixed = run(
      "SELECT COUNT(*), PERCENTILE50(l_extendedprice) FROM lineitem " +
        "GROUP BY l_returnflag TOP 10")
    assert(mixed.columns.toSeq === Seq("l_returnflag", "count_star",
      "percentile50_l_extendedprice"))
    assert(!mixed.queryExecution.optimizedPlan.toString.contains("percentile("))
    val counts = li.groupBy($"l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    mixed.collect().foreach { r =>
      assert(r.getLong(1) === counts(r.getString(0)))
      assert(r.getDouble(2) === want(r.getString(0))._1)
    }
  }

  test("GROUPED exact PERCENTILE whose argument IS a group-by key resolves " +
      "(reserved _rs_v alias, no ambiguous reference)") {
    // l_quantity: wide (double) with ≤64 distinct values, so this
    // routes to rankSelectKeyed; selecting the value column under its
    // own name next to the identical group column threw an
    // ambiguous-reference AnalysisException before the alias fix
    val out = run(
      "SELECT PERCENTILE50(l_quantity) FROM lineitem GROUP BY l_quantity TOP 60")
    val got = out.collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // each group is a single repeated value — every percentile of the
    // group equals the key itself
    got.foreach { case (k, p50) => assert(p50 === k, s"group $k") }
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
    assert(got.size === li.select($"l_quantity").distinct().count().toInt)
  }

  test("same-column PERCENTILEEST aggregations fuse into one sketch build") {
    // global aggregation: two fractions, ONE percentile_approx in the plan
    val global = run(
      "SELECT PERCENTILEEST50(l_quantity), PERCENTILEEST95(l_quantity) FROM lineitem")
    assert(global.columns.toSeq ===
      Seq("percentileest50_l_quantity", "percentileest95_l_quantity"))
    val plan = global.queryExecution.optimizedPlan.toString
    assert("percentile_approx".r.findAllIn(plan).size === 1,
      s"expected one fused percentile_approx, plan:\n$plan")
    // values stay within the 0.1%-rank-error envelope of the exact
    // percentiles (generous absolute bound on this integer column)
    val Seq((e50, e95)) = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .select(percentile($"l_quantity", lit(0.5)), percentile($"l_quantity", lit(0.95)))
      .as[(Double, Double)].collect().toSeq
    def num(r: org.apache.spark.sql.Row, i: Int): Double =
      r.get(i).asInstanceOf[Number].doubleValue()
    val row = global.head()
    assert(math.abs(num(row, 0) - e50) <= 1.0)
    assert(math.abs(num(row, 1) - e95) <= 1.0)
    // grouped + mixed with exact PERCENTILE and other aggregations:
    // fused column expands back under its PQL name, per group
    val grouped = run(
      "SELECT PERCENTILEEST50(l_quantity), PERCENTILEEST90(l_quantity), " +
        "PERCENTILE50(l_quantity), COUNT(*) FROM lineitem GROUP BY l_returnflag TOP 10")
    assert(grouped.columns.toSeq === Seq("l_returnflag",
      "percentileest50_l_quantity", "percentileest90_l_quantity",
      "percentile50_l_quantity", "count_star"))
    val gplan = grouped.queryExecution.optimizedPlan.toString
    assert("percentile_approx".r.findAllIn(gplan).size === 1)
    grouped.collect().foreach { r =>
      // est50 and exact 50 agree within the tight-accuracy envelope
      assert(math.abs(num(r, 1) - num(r, 3)) <= 1.0)
    }
  }
}
