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

  test("tokenCount kernel == declarative on every document") {
    val diff = docs.select(
        TextAnalysis.tokenCount($"text").as("k"),
        TextAnalysis.tokenCountDeclarative($"text").as("d"))
      .filter(not($"k" <=> $"d"))
    assert(diff.count() === 0, diff.take(3).mkString("; "))
  }

  test("normalized kernel == declarative on every document") {
    val diff = docs.select(
        TextAnalysis.normalized($"text").as("k"),
        TextAnalysis.normalizedDeclarative($"text").as("d"))
      .filter(not($"k" <=> $"d"))
    assert(diff.count() === 0, diff.take(3).mkString("; "))
  }

  test("tokenCount/normalized kernels == declarative on fuzzed strings") {
    // mixed whitespace runs, ends, case, unicode (slow path), controls
    val rnd = new scala.util.Random(20260814L)
    val alphabet = "aA zZ\t\n\f\r 09.,!?éÀ的め１"
    val fuzz = (0 until 2000).map { _ =>
      val n = rnd.nextInt(40)
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    } ++ Seq("", " ", "  a  ", "\ta\t", " \t mixed CASE\r\n runs ",
      "ＡＢＣ　ＤＥＦ", "a b", "Σίσυφος ΣΊΣΥΦΟΣ",
      // stopword-profile collisions and ties across languages
      "the la le der el und est que de is", "la la la", "de de que",
      "und ist ein zu", "the 的是 und", "el la los y es un")
    val diff = fuzz.toDF("text").select($"text",
        TextAnalysis.tokenCount($"text").as("k1"),
        TextAnalysis.tokenCountDeclarative($"text").as("d1"),
        TextAnalysis.normalized($"text").as("k2"),
        TextAnalysis.normalizedDeclarative($"text").as("d2"),
        // the ASCII fast path vs generic dispatch inside these kernels
        // must be invisible: fuzz strings straddle the boundary
        TextAnalysis.langId($"text").as("k3"),
        TextAnalysis.langIdDeclarative($"text").as("d3"),
        TextAnalysis.qualityMetrics($"text").as("k4"),
        TextAnalysis.qualityMetricsDeclarative($"text").as("d4"))
      .filter(not($"k1" <=> $"d1") || not($"k2" <=> $"d2") ||
        not($"k3" <=> $"d3") || not($"k4" <=> $"d4"))
    assert(diff.count() === 0, diff.take(5).mkString("; "))
  }

  private def fuzzStrings(seed: Long, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val alphabet = "aA zZ\t\n\f\r 09.,!?éÀ的め１"
    (0 until n).map { _ =>
      val len = rnd.nextInt(40)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    } ++ Seq("", " ", "  a  ", "\ta\t", " \t mixed CASE\r\n runs ",
      "ＡＢＣ　ＤＥＦ", "a b", "Σίσυφος ΣΊΣΥΦΟΣ",
      "the la le der el und est que de is", "la la la", "de de que",
      "und ist ein zu", "the 的是 und", "el la los y es un")
  }

  test("fused langQuality == (langId, qualityScore) on corpus + fuzz") {
    val fuzz = fuzzStrings(20260814L, 2000).toDF("text")
    Seq(docs.select($"text"), fuzz).foreach { df =>
      val diff = df.select($"text",
          TextAnalysis.langQuality($"text").as("lq"),
          TextAnalysis.langId($"text").as("lang"),
          TextAnalysis.qualityScore($"text").as("q"))
        .filter(not($"lq.lang" <=> $"lang") || not($"lq.quality" <=> $"q"))
      assert(diff.count() === 0, diff.take(5).mkString("; "))
    }
  }

  test("fused md5Normalized == unhex(md5(normalized)) on corpus + fuzz") {
    val fuzz = fuzzStrings(99118822L, 2000).toDF("text")
    Seq(docs.select($"text"), fuzz).foreach { df =>
      val diff = df.select($"text",
          TextAnalysis.fingerprintMd5Bin($"text").as("bin"),
          unhex(TextAnalysis.fingerprintMd5($"text")).as("ref"))
        .filter(not($"bin" <=> $"ref"))
      assert(diff.count() === 0, diff.take(5).mkString("; "))
    }
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
