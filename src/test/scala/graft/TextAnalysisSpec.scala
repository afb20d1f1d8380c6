package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount handles whitespace runs and empties") {
    val df = Seq("a b  c", "  ", "", "one").toDF("text")
    assert(df.select(TextAnalysis.tokenCount($"text")).as[Int].collect().toSeq
      === Seq(3, 0, 0, 1))
  }

  test("langId identifies real sentences by stopword profile") {
    val df = Seq(
      ("en", "the cat sat on the mat and it is happy"),
      ("de", "der hund und die katze sind nicht zu hause mit dem ball"),
      ("fr", "le chat est sur la table et les livres sont pour toi"),
      ("es", "el perro y los gatos es una casa de que por favor"),
      ("und", "xyzzy plugh quux")).toDF("expected", "text")
    val got = df.select($"expected", TextAnalysis.langId($"text").as("got"))
      .as[(String, String)].collect()
    got.foreach { case (exp, g) => assert(g === exp, s"expected $exp got $g") }
  }

  test("qualityScore is in [0,1], penalizes garbage") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and keeps running through fields all day long",
      "a",
      "!!!!....;;;;::::!!!!....;;;;").toDF("text")
    val scores = df.select(TextAnalysis.qualityScore($"text")).as[Double].collect()
    assert(scores.forall(x => x >= 0.0 && x <= 1.0))
    assert(scores(0) > scores(1), "long clean text beats 1-char text")
    assert(scores(0) > scores(2), "long clean text beats punct flood")
  }

  test("bpeTokenEstimate counts word pieces plus punctuation") {
    // "abcdefgh ij." -> ceil(8/4)+ceil(2/4)=3 pieces + 1 punct = 4
    val df = Seq("abcdefgh ij.").toDF("text")
    assert(df.select(TextAnalysis.bpeTokenEstimate($"text")).as[Long].head() === 4L)
  }
}
