package graft

import graft.pql.{CorpusHarness, OnTimeCorpus, Pql}

/** Result-level golden-corpus execution, sampled (the always-on gate;
  * the full 10,000-line sweep lives in [[CorpusFullSpec]]). Every
  * sampled line's PQL must produce results the paired hsqls confirm
  * under the reference harness's own comparison semantics. */
class CorpusSpec extends SparkSpec {

  test("corpus file parses into (pql, hsqls) lines with the expected multiplicities") {
    val lines = OnTimeCorpus.loadCorpus()
    assert(lines.length === 10000)
    assert(lines.head.hsqls.nonEmpty)
    // one hsql per aggregation, one for selections (reference layout)
    lines.grouped(100).map(_.head).foreach { l =>
      val q = Pql.parse(l.pql)
      val nAggs = q.select.count(Pql.isAggExpr)
      if (nAggs > 0) assert(l.hsqls.length === nAggs, s"line ${l.id}")
      else assert(l.hsqls.length === 1, s"line ${l.id}")
    }
  }

  test("literal pools cover nearly every column, typed") {
    val pools = OnTimeCorpus.minePools(OnTimeCorpus.loadCorpus())
    assert(pools.size >= 75, s"only ${pools.size} columns pooled")
    assert(pools("DestState").forall(_.isInstanceOf[String]))
    assert(pools("ArrTime").forall(_.isInstanceOf[BigDecimal]))
  }

  test("synthesis is deterministic and predicates are selective") {
    val fx = CorpusHarness.fixture(spark)
    assert(fx.mv.count() === 8000)
    // same seed → identical frame (hash both builds)
    import org.apache.spark.sql.functions._
    val again = OnTimeCorpus.synthesize(spark,
      graft.pql.PinotSchema.load(spark, OnTimeCorpus.SchemaPath),
      OnTimeCorpus.minePools(fx.lines), 8000)
    def fp(df: org.apache.spark.sql.DataFrame) = OnTimeCorpus.flatten(df)
      .agg(bit_xor(xxhash64(col("Carrier"), col("ArrTime"), col("DivTailNums__MV0"))))
      .head().getLong(0)
    assert(fp(fx.mv) === fp(again), "same seed must give identical data")
    // pool-driven values: corpus predicates actually select rows
    val sel = fx.flat.where("DestState IN ('VI', 'UT', 'VA') OR ArrTime < 806").count()
    assert(sel > 0 && sel < 8000, s"predicate should be selective, got $sel")
  }

  test("sampled corpus lines all match PQL-vs-hsql (every 100th line)") {
    val outcomes = CorpusHarness.runLines(spark, CorpusHarness.sampleIds(100)).collect()
    val bad = outcomes.filter(!_.getBoolean(2))
    assert(bad.isEmpty, s"${bad.length}/${outcomes.length} mismatched; first 5:\n" +
      bad.take(5).map(r => s"  line ${r.getInt(0)} [${r.getString(1)}]: ${r.getString(3)}")
        .mkString("\n"))
  }

  test("hybrid stitched view is row-identical to the plain table (exactly-once)") {
    val fx = CorpusHarness.fixture(spark)
    val hv = CorpusHarness.hybridView(spark)
    // overlap is real: the realtime side carries ALL rows, the offline
    // slice is non-empty — yet the stitch loses and duplicates nothing
    assert(hv.count() === fx.mv.count(), "row count through the boundary")
    val key = org.apache.spark.sql.functions.xxhash64(
      fx.mv.columns.map(c => org.apache.spark.sql.functions.col(c).cast("string")): _*)
    val a = fx.mv.select(key.as("h")).groupBy("h").count()
    val b = hv.select(key.as("h")).groupBy("h").count()
    assert(a.except(b).isEmpty && b.except(a).isEmpty,
      "hybrid view must reproduce the exact multiset of rows")
  }

  test("sampled corpus lines match from the HYBRID view (every 200th line)") {
    val outcomes = CorpusHarness.runLines(spark, CorpusHarness.sampleIds(200),
      hybrid = true).collect()
    val bad = outcomes.filter(!_.getBoolean(2))
    assert(bad.isEmpty, s"${bad.length}/${outcomes.length} mismatched; first 5:\n" +
      bad.take(5).map(r => s"  line ${r.getInt(0)} [${r.getString(1)}]: ${r.getString(3)}")
        .mkString("\n"))
  }

  test("duck slice emits one rounded value per aggregation of the first 40 agg-only lines") {
    val df = CorpusHarness.duckSlice(spark, 5)
    val rows = df.collect()
    assert(rows.length >= 5)
    val oracle = CorpusHarness.duckSliceOracle(5)
    // the dump lives in a SIBLING of the verify out dir ("<out>_aux"):
    // anything inside outDir surfaces as a bogus no-oracle result row
    assert(oracle.contains("read_parquet('{OUT}_aux/corpus_flat_parquet/*.parquet')"))
    assert(oracle.count(_ == '{') === oracle.count(_ == '}'))
  }
}
