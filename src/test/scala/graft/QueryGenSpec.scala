package graft

import graft.pql.{CorpusHarness, OnTimeCorpus, Pql, QueryGen, QueryGenB}

/** The randomized-query-generator gate (VERDICT r10 item 2): 500
  * generated PQL/SQL pairs per round through the corpus harness's
  * comparator — combinations the fixed 10K corpus cannot produce
  * anymore (its literal pools were mined into the fixture). A
  * mismatch here is a front-end compilation bug by construction: both
  * sides run over identical data through independent parse paths. */
class QueryGenSpec extends SparkSpec {

  test("generation is deterministic: same (n, seed) → identical lines") {
    val a = QueryGen.lines(40, seed = 7L)
    val b = QueryGen.lines(40, seed = 7L)
    assert(a == b)
    val c = QueryGen.lines(40, seed = 8L)
    assert(a != c, "different seeds must generate different query sets")
  }

  test("schema read matches the Spark-side fixture schema (names, MV split)") {
    val cols = QueryGen.loadColumns()
    val fx = CorpusHarness.fixture(spark)
    val sparkFields = fx.mv.schema.fields
    assert(cols.map(_.name).toSet === sparkFields.map(_.name).toSet)
    val mvSpark = sparkFields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] => f.name
    }.toSet
    assert(cols.filter(_.multiValue).map(_.name).toSet === mvSpark)
  }

  test("500 generated lines: every PQL parses and matches its SQL twin") {
    val lines = QueryGen.lines(500, seed = QueryGen.DefaultSeed)
    // shape-coverage sanity: the generator must actually exercise the
    // grammar regions it exists for
    val parsed = lines.map(l => Pql.parse(l.pql))
    assert(parsed.exists(_.groupBy.nonEmpty), "no group-by generated")
    assert(parsed.exists(q => q.groupBy.isEmpty && q.select.forall(Pql.isAggExpr)),
      "no global aggregation generated")
    assert(parsed.exists(q => !q.select.exists(Pql.isAggExpr)),
      "no selection generated")
    assert(lines.exists(_.pql.contains("REGEXP_LIKE")), "no regex predicate generated")
    assert(lines.exists(_.pql.contains("NOT IN")), "no NOT IN generated")
    assert(lines.exists(_.hsqls.exists(_.contains("__MV"))),
      "no multi-value predicate or projection generated")

    val fx = CorpusHarness.fixture(spark)
    val outcomes = CorpusHarness.compareAll(spark, fx, lines)
    val failed = outcomes.filterNot(_.matched)
    assert(failed.isEmpty,
      s"${failed.size}/500 generated lines mismatched; first 5:\n" +
        failed.take(5).map(o =>
          s"  [${o.id}] ${o.mode}: ${o.reason}\n    pql: ${lines(o.id).pql}\n" +
            s"    sql: ${lines(o.id).hsqls.head}").mkString("\n"))
  }

  test("generated sample through the star-tree-routed fixture: all matched, " +
      "and the dimension is not vacuous (some lines actually route)") {
    import graft.queries.CorpusQueries._
    val routed = QueryGen.runSample(spark, GenSampleLines, starTree = true).collect()
    assert(routed.length === GenSampleLines)
    assert(routed.forall(_.getBoolean(1)),
      "a generated line mismatched under star-tree routing")
    // vacuity guard: at least one generated line must be answered from
    // a registered rollup, or the mode adds nothing over the plain run
    val fx = CorpusHarness.fixture(spark)
    graft.Graft.enable(spark)
    CorpusHarness.registerCorpusTrees(spark, fx)
    try {
      val fact = spark.read.parquet(CorpusHarness.stFactDir())
      val nRouted = QueryGen.lines(GenSampleLines).count { l =>
        val q = try Some(Pql.parse(l.pql))
        catch { case _: IllegalArgumentException => None }
        q.exists(CorpusHarness.isRouted(_, fact))
      }
      assert(nRouted > 0, "no generated line routed to a star-tree rollup")
      info(s"$nRouted/$GenSampleLines generated lines answered from rollups")
    } finally graft.plans.StarTreeRegistry.unregister(CorpusHarness.stFactDir())
  }

  test("generated sample through the hybrid stitched view: all matched") {
    import graft.queries.CorpusQueries._
    val hybrid = QueryGen.runSample(spark, GenSampleLines, hybrid = true).collect()
    assert(hybrid.length === GenSampleLines)
    assert(hybrid.forall(_.getBoolean(1)),
      "a generated line mismatched through the hybrid boundary stitch")
  }

  // ---- mode B: graft's full PQL surface (QueryGenB) --------------------

  test("mode B: generation is deterministic and duck slices are static contracts") {
    assert(QueryGenB.lines(40, seed = 7L) == QueryGenB.lines(40, seed = 7L))
    assert(QueryGenB.lines(40, seed = 7L) != QueryGenB.lines(40, seed = 8L))
    assert(QueryGenB.duckSelLines(10) == QueryGenB.duckSelLines(10))
  }

  test("mode B: 500 graft-surface lines — full shape coverage, every line matches") {
    val lines = QueryGenB.lines(500, QueryGenB.DefaultSeed)
    val all = lines.map(_.pql)
    def covered(what: String, p: String => Boolean): Unit =
      assert(all.exists(p), s"mode B generated no $what")
    covered("exact percentile", _.matches(""".*PERCENTILE\d+\(.*"""))
    covered("PERCENTILEEST", _.contains("PERCENTILEEST"))
    covered("PERCENTILETDIGEST", _.contains("PERCENTILETDIGEST"))
    covered("percentile MV twin", _.matches(""".*PERCENTILE\d+MV\(.*"""))
    covered("MV aggregation twin", s => Seq("COUNTMV(", "SUMMV(", "MINMV(",
      "MAXMV(", "AVGMV(", "MINMAXRANGEMV(").exists(s.contains))
    covered("DISTINCTCOUNTMV", _.contains("DISTINCTCOUNTMV("))
    covered("DISTINCTCOUNT", _.contains("DISTINCTCOUNT("))
    covered("DISTINCTCOUNTHLL", _.contains("DISTINCTCOUNTHLL("))
    covered("MINMAXRANGE", _.contains("MINMAXRANGE("))
    covered("HAVING", _.contains("HAVING"))
    covered("TIMECONVERT key/projection", _.contains("TIMECONVERT("))
    covered("DATETIMECONVERT key/projection", _.contains("DATETIMECONVERT("))
    covered("VALUEIN group key", _.contains("VALUEIN("))
    covered("arithmetic transform", s => Seq("ADD(", "SUB(", "MULT(", "DIV(")
      .exists(s.contains))
    covered("SELECT DISTINCT", _.startsWith("SELECT DISTINCT"))
    covered("LIMIT offset,size pagination", _.matches(""".*LIMIT \d+, \d+$"""))
    covered("IS NULL predicate", _.contains(" IS NULL"))
    covered("IS NOT NULL predicate", _.contains(" IS NOT NULL"))
    // the hidden-aggregation HAVING path: a HAVING referencing an
    // aggregation that is NOT in the select list
    def predAggs(p: Pql.Pred): Seq[Pql.Expr] = p match {
      case Pql.Cmp(e, _, _) if Pql.isAggExpr(e) => Seq(e)
      case Pql.Between(e, _, _) if Pql.isAggExpr(e) => Seq(e)
      case Pql.AndP(ps) => ps.flatMap(predAggs)
      case Pql.OrP(ps) => ps.flatMap(predAggs)
      case _ => Nil
    }
    val hidden = lines.exists { l =>
      val q = Pql.parse(l.pql)
      val selected = q.select.map(_.toString).toSet
      q.having.exists(h => predAggs(h).exists(e => !selected.contains(e.toString)))
    }
    assert(hidden, "mode B generated no hidden-aggregation HAVING")

    val fx = CorpusHarness.fixture(spark)
    val failed = CorpusHarness.compareAll(spark, fx, lines).filterNot(_.matched)
    assert(failed.isEmpty,
      s"${failed.size}/500 mode-B lines mismatched; first 5:\n" +
        failed.take(5).map(o =>
          s"  [${o.id}] ${o.mode}: ${o.reason}\n    pql: ${lines(o.id).pql}\n" +
            s"    sql: ${lines(o.id).hsqls.head}").mkString("\n"))
  }

  test("MV aggregation over an MV group-by key feeds the row's full entry") {
    // engine regression pin (found by the mode-B sweep): the group-key
    // explode must PRESERVE the array column so an MV aggregation over
    // the same column still sees the whole entry — the reference's
    // group executor feeds the row's full MV value buffer into every
    // group the row lands in
    import spark.implicits._
    val df = Seq((Seq(1, 2), 10), (Seq(2), 20)).toDF("mv", "x")
    val q = Pql.parse("SELECT SUMMV(mv), SUM(x) FROM t GROUP BY mv TOP 10")
    val out = Pql.toDataFrame(q, _ => df).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    // element-group 1 ← row1 (elements {1,2}): SUMMV = 1+2 = 3
    // element-group 2 ← row1 + row2: SUMMV = (1+2) + 2 = 5
    assert(out === Set((1, 3L, 10L), (2, 5L, 30L)))
  }

  test("mode B duck slices are non-trivial and internally consistent") {
    import graft.queries.CorpusQueries._
    val aggLines = QueryGenB.duckAggLines(GenBDuckLines, GenBPoolSize)
    assert(aggLines.length === GenBDuckLines,
      s"600-line pool yields only ${aggLines.length} duckable agg lines — grow GenBPoolSize")
    val slice = QueryGenB.duckAggSlice(spark, GenBDuckLines, GenBPoolSize).collect()
    assert(slice.length >= GenBDuckLines)
    // one oracle branch per (line, agg) — counted by its `AS agg_idx`
    // marker (MV element-view twins contain UNION ALL internally, so
    // splitting on that would overcount)
    assert(QueryGenB.duckAggOracle(GenBDuckLines, GenBPoolSize)
      .split("AS agg_idx").length - 1 === slice.length)
    // selection slice: the Spark-side rows must exactly equal the twin
    // statement executed by Spark SQL over the flat view (DuckDB then
    // re-values the same statement externally via the driver oracle)
    val fx = CorpusHarness.fixture(spark)
    val selLines = QueryGenB.duckSelLines(GenBSelLines)
    val twinRows = selLines.flatMap { l =>
      spark.sql(l.hsqls.head).collect().map { r =>
        val cells = (0 until r.length).map(i => String.valueOf(r.get(i))).padTo(3, "")
        (l.id, cells(0), cells(1), cells(2))
      }
    }.toSet
    val engineRows = QueryGenB.duckSelSlice(spark, GenBSelLines).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(engineRows === twinRows,
      "mode-B selection slice differs from its Spark-SQL twin")
    assert(engineRows.nonEmpty)
  }

  test("the q_querygen_graft sample is green") {
    import graft.queries.CorpusQueries._
    val sample = QueryGenB.runSample(spark, GenBSampleLines).collect()
    assert(sample.length === GenBSampleLines)
    assert(sample.forall(_.getBoolean(1)), "q_querygen_graft has a mismatched line")
  }

  test("mode B through star-tree routing and the hybrid stitch: all matched, " +
      "routing not vacuous over the default-seed stream") {
    import graft.queries.CorpusQueries._
    val st = QueryGenB.runSample(spark, GenBSampleLines, starTree = true).collect()
    assert(st.length === GenBSampleLines)
    assert(st.forall(_.getBoolean(1)),
      "a mode-B line mismatched under star-tree routing")
    val hy = QueryGenB.runSample(spark, GenBSampleLines, hybrid = true).collect()
    assert(hy.length === GenBSampleLines)
    assert(hy.forall(_.getBoolean(1)),
      "a mode-B line mismatched through the hybrid boundary stitch")
    // vacuity guard over a wider default-seed stream: mode-B lines are
    // mostly graft-only shapes the routing rule must NOT touch, but
    // its basic-agg subset must actually route (the 10-seed sweep saw
    // 105/2500 ≈ 4%)
    val fx = CorpusHarness.fixture(spark)
    graft.Graft.enable(spark)
    CorpusHarness.registerCorpusTrees(spark, fx)
    try {
      val fact = spark.read.parquet(CorpusHarness.stFactDir())
      val nRouted = QueryGenB.lines(300).count { l =>
        val q = try Some(Pql.parse(l.pql))
        catch { case _: IllegalArgumentException => None }
        q.exists(CorpusHarness.isRouted(_, fact))
      }
      assert(nRouted > 0, "no mode-B line routed to a star-tree rollup")
      info(s"$nRouted/300 mode-B lines answered from rollups")
    } finally graft.plans.StarTreeRegistry.unregister(CorpusHarness.stFactDir())
  }

  // ---- rotating-seed gate (both grammars) ------------------------------

  test("rotating-seed sweep: today's generated lines (both grammars) all match") {
    // A FRESH combination space every round (seed = UTC date) on top
    // of the fixed-seed sets. NON-FATAL-BUT-LOUD by design (r11
    // ADVICE): the same commit must not pass one day and fail the
    // next on unrelated CI runs, so a mismatch CANCELS with the full
    // repro printed instead of failing.
    //
    // PROTOCOL on first fire: reproduce with
    // QueryGen[B].lines(150, <printed seed>), fix the divergence, and
    // add (grammar, seed, id) to PinnedRegressions below so the case
    // runs FATALLY forever after. The round-level QueryGenSweep gate
    // (fixed + fresh seeds, wide) still hard-fails on any mismatch.
    val seed = QueryGen.rotatingSeed()
    val fx = CorpusHarness.fixture(spark)
    def sweep(tag: String, lines: Vector[OnTimeCorpus.Line]): Seq[String] =
      CorpusHarness.compareAll(spark, fx, lines).filterNot(_.matched).map(o =>
        s"[grammar $tag seed=$seed id=${o.id}] ${o.mode}: ${o.reason}\n" +
          s"  pql: ${lines(o.id).pql}\n  sql: ${lines(o.id).hsqls.head}")
    val bad = sweep("A", QueryGen.lines(150, seed)) ++
      sweep("B", QueryGenB.lines(150, seed))
    if (bad.nonEmpty) {
      bad.foreach(alert(_))
      cancel(s"${bad.size} rotating-seed mismatches (seed=$seed) — " +
        "fix and add to PinnedRegressions per the protocol above")
    }
  }

  /** (grammar, seed, lineId) cases discovered by the rotating sweep,
    * pinned here after the fix so they re-run fatally every build. */
  private val PinnedRegressions: Seq[(String, Long, Int)] = Nil

  test("pinned rotating-seed regressions stay fixed") {
    val fx = CorpusHarness.fixture(spark)
    PinnedRegressions.foreach { case (g, seed, id) =>
      val line =
        if (g == "B") QueryGenB.lines(id + 1, seed)(id)
        else QueryGen.lines(id + 1, seed)(id)
      val o = CorpusHarness.compareAll(spark, fx, Seq(line)).head
      assert(o.matched, s"pinned regression ($g, seed=$seed, id=$id) " +
        s"regressed: ${o.reason}\n  pql: ${line.pql}")
    }
  }

  test("the driver-gated sample and duck slice are green and non-trivial") {
    import graft.queries.CorpusQueries._
    val sample = QueryGen.runSample(spark, GenSampleLines).collect()
    assert(sample.length === GenSampleLines)
    assert(sample.forall(_.getBoolean(1)), "q_querygen_sample has a mismatched line")
    val aggLines = QueryGen.aggOnlyLines(GenDuckLines, GenPoolSize)
    assert(aggLines.length === GenDuckLines,
      s"generated pool yields only ${aggLines.length} agg-only lines — grow GenPoolSize")
    val slice = QueryGen.duckSlice(spark, GenDuckLines, GenPoolSize).collect()
    assert(slice.length >= GenDuckLines, "each agg-only line contributes ≥1 value row")
    // the oracle is a static contract: one SELECT per (line, agg)
    val oracle = QueryGen.duckOracle(GenDuckLines, GenPoolSize)
    assert(oracle.split("UNION ALL").length === slice.length)
  }
}
