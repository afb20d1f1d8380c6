package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.sources.Tables

/** The codegen'd text kernels must be cell-identical to their
  * declarative Column twins over the real corpus — the same guarantee
  * LshParitySpec gives for the hyperplane kernel. A divergence here
  * means the DuckDB oracle (which mirrors the declarative form) would
  * flag the kernel, so this catches it before the driver does. */
class TextKernelParitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  test("qualityMetrics kernel == declarative on every document") {
    val diff = docs.select(
        TextAnalysis.qualityMetrics($"text").as("k"),
        TextAnalysis.qualityMetricsDeclarative($"text").as("d"))
      .filter(not($"k" <=> $"d"))
    assert(diff.count() === 0, diff.take(3).mkString("; "))
  }

  test("qualityScore kernel == declarative on every document") {
    val diff = docs.select(
        TextAnalysis.qualityScore($"text").as("k"),
        TextAnalysis.qualityScoreDeclarative($"text").as("d"))
      .filter(not($"k" <=> $"d"))
    assert(diff.count() === 0, diff.take(3).mkString("; "))
  }

  test("langId kernel == declarative on every document") {
    val diff = docs.select($"doc_id",
        TextAnalysis.langId($"text").as("k"),
        TextAnalysis.langIdDeclarative($"text").as("d"))
      .filter(not($"k" <=> $"d"))
    assert(diff.count() === 0, diff.take(3).mkString("; "))
  }

  test("kernels agree on edge cases: empty, whitespace, unicode, punct flood") {
    val edge = Seq("", "   ", "\t\n", "的是在了和", "!!!!....", "１２３ ４５６",
      "the the the", "À É め").toDF("text")
    val diff = edge.select(
        TextAnalysis.qualityMetrics($"text").as("k1"),
        TextAnalysis.qualityMetricsDeclarative($"text").as("d1"),
        TextAnalysis.langId($"text").as("k2"),
        TextAnalysis.langIdDeclarative($"text").as("d2"))
      .filter(not($"k1" <=> $"d1") || not($"k2" <=> $"d2"))
    assert(diff.count() === 0, diff.take(5).mkString("; "))
  }
}
