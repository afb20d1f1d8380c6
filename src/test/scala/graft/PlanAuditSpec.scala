package graft

import org.apache.spark.sql.DataFrame
import graft.queries.{CoreQueries, PipelineQueries}

/** Physical-plan audits: the scale properties the engine claims
  * (pushdown, pruning, broadcast, partial aggregation) asserted
  * against the actual executed plans, so a regression that silently
  * de-optimizes a plan fails CI even while results stay correct. */
class PlanAuditSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("predicate battery pushes filters into the parquet scan") {
    val p = plan(CoreQueries.qFilterPredicates(spark, sfDir))
    // the FileScan metadata string truncates, so assert the leading
    // pushed filters plus the full predicate reaching the Filter node
    assert(p.contains("PushedFilters: [IsNotNull"), p.take(800))
    assert(p.contains("EqualTo(l_returnflag,R)"), "EQ not pushed")
    assert(p.contains("(l_quantity#") && p.contains(">= 5.0)"), "range not in scan-side filter")
  }

  test("projection prunes the scan to selected columns only") {
    val p = plan(CoreQueries.qSelectLimit(spark, sfDir))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("n_nationkey") && readSchema.contains("n_name") &&
      readSchema.contains("n_regionkey"))
    assert(!readSchema.contains("n_comment"), s"unpruned scan: $readSchema")
  }

  test("star join broadcasts every dimension (fact side never shuffles for the joins)") {
    val p = plan(CoreQueries.qJoinStar(spark, sfDir))
    val broadcasts = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(broadcasts >= 2, s"expected >=2 broadcast joins, plan:\n${p.take(1200)}")
  }

  test("group-by aggregation is two-phase (map-side partial before the shuffle)") {
    val p = plan(CoreQueries.qAggBasic(spark, sfDir))
    assert(p.contains("partial_"), "no partial aggregation phase")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2, "not two-phase")
  }

  test("GROUP BY TOP N uses a bounded TakeOrdered, not a global sort") {
    val p = plan(CoreQueries.qGroupByTopN(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("knn top-k partially aggregates map-side (no all-candidate window shuffle)") {
    val p = plan(PipelineQueries.qKnnJoin(spark, sfDir))
    assert(p.contains("top_k_by_score"), "bounded-heap aggregate missing")
    assert(p.contains("partial_top_k_by_score") || p.contains("ObjectHashAggregate"),
      s"no partial top-k phase:\n${p.take(1200)}")
    assert(!p.contains("Window"), "window top-k crept back in")
  }

  test("ivfKnn over a pre-assigned corpus does not recompute cell assignment") {
    import graft.operators.Similarity
    import graft.sources.Tables
    val emb = Tables.load(spark, sfDir, "embeddings")
    val model = Similarity.ivfTrain(emb, "vec_id", "embedding", k = 8, iters = 1,
      sampleFraction = 0.5)
    // materialize the cell column like a segment write, then read back
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toFile.getAbsolutePath
    Similarity.ivfAssign(emb, "embedding", model)
      .write.mode("overwrite").parquet(dir)
    val assigned = spark.read.parquet(dir)
    val queries = emb.limit(5)
    val pre = plan(Similarity.ivfKnn(queries, "vec_id", assigned, "vec_id",
      "embedding", 3, model, nprobe = 2, cellCol = Some("ivf_cell")))
    // corpus side must use the stored column: nearest_cell( (scalar
    // assignment) absent; the query-side probe list nearest_cells( stays
    assert(!pre.contains("nearest_cell("), s"cell re-assignment crept in:\n${pre.take(1200)}")
    assert(pre.contains("nearest_cells("), "query probe list missing")
    val inline = plan(Similarity.ivfKnn(queries, "vec_id", emb, "vec_id",
      "embedding", 3, model, nprobe = 2))
    assert(inline.contains("nearest_cell("), "sanity: inline path assigns cells")
  }

  test("jaccard similarity join: kernel shingles, hash-joined candidates, no cartesian") {
    import graft.operators.Dedup
    import graft.sources.Tables
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") < 100).select(col("doc_id"), col("text"))
    val p = plan(Dedup.jaccardSimilarityJoin(docs, "doc_id", "text",
      n = 2, threshold = 0.7))
    assert(!p.contains("CartesianProduct"),
      "candidate generation degenerated to all-pairs")
    assert(p.contains("ngram_shingles"),
      "shingle kernel missing — interpreted HOF shingling crept back in")
    assert(!p.toLowerCase.contains("slice("),
      "per-element slice formulation crept back in")
  }

  test("fused langQuality evaluates ONCE per row in the p2 group-by shape") {
    // the BenchScale p2 formulation references lq.lang (group key) and
    // lq.quality (avg input) — CollapseProject must NOT inline the
    // non-cheap kernel into both consumers, or the fusion win is lost
    import org.apache.spark.sql.functions.{avg, col, count, lit}
    import graft.operators.TextAnalysis
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val df = docs.select(TextAnalysis.langQuality(col("text")).as("lq"))
      .groupBy(col("lq.lang").as("lang_id"))
      .agg(count(lit(1)).as("n"), avg(col("lq.quality")).as("avg_q"))
    val p = plan(df)
    val evals = "lang_quality\\(".r.findAllIn(p).size
    assert(evals == 1, s"lang_quality evaluated $evals times in:\n${p.take(1500)}")
  }

  test("whole-stage codegen covers the text-kernel pipeline") {
    // AQE reports 0 codegen subtrees before the plan finalizes; turn it
    // off for this inspection only
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = PipelineQueries.qQuality(spark, sfDir)
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
      assert(p.contains("WholeStageCodegen subtrees"), "kernels fell out of codegen")
      assert(!p.contains("Found 0 WholeStageCodegen"), "zero codegen stages")
      assert(p.contains("quality_score"), "kernel not inside a codegen stage")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
