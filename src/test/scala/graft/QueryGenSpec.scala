package graft

import graft.pql.{CorpusHarness, OnTimeCorpus, Pql, QueryGen}

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

  test("rotating-seed sweep: today's 300 generated lines all match") {
    // a FRESH combination space every round (seed = UTC date) on top
    // of the fixed-seed 500 — a failure here names the seed, so it
    // reproduces exactly with QueryGen.lines(300, seed)
    val seed = QueryGen.rotatingSeed()
    val lines = QueryGen.lines(300, seed)
    val fx = CorpusHarness.fixture(spark)
    val failed = CorpusHarness.compareAll(spark, fx, lines).filterNot(_.matched)
    assert(failed.isEmpty,
      s"${failed.size}/300 rotating-seed (seed=$seed) lines mismatched; first 5:\n" +
        failed.take(5).map(o =>
          s"  [${o.id}] ${o.mode}: ${o.reason}\n    pql: ${lines(o.id).pql}\n" +
            s"    sql: ${lines(o.id).hsqls.head}").mkString("\n"))
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
