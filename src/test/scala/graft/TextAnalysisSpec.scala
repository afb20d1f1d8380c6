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

  /** Brute-force reference twin of the repetitionStats kernel. */
  private def refRepetition(text: String, delim: String) = {
    def round4(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val units = text.split(java.util.regex.Pattern.quote(delim), -1)
      .map(_.trim).filter(_.nonEmpty).toSeq
    val counts = units.groupBy(identity).view.mapValues(_.size).toMap
    val dupUnits = counts.values.map(_ - 1).sum
    val dupChars = counts.map { case (u, c) => (c - 1).toLong * u.length }.sum
    val unitChars = units.map(_.length.toLong).sum
    val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
    val tokChars = toks.map(_.length.toLong).sum
    val bigrams = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
    val top = bigrams.groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (k, c) => (-c, k) }.headOption
    val topFrac = top match {
      case Some((k, c)) if c > 1 && tokChars > 0 =>
        round4(c.toDouble * (k.length - 1) / tokChars)
      case _ => 0.0
    }
    val grams = toks.sliding(5).filter(_.size == 5).map(_.mkString(" ")).toSeq
    val gcount = grams.groupBy(identity).view.mapValues(_.size).toMap
    val covered = Array.fill(toks.size)(false)
    grams.zipWithIndex.foreach { case (g, i) =>
      if (gcount(g) > 1) (i until i + 5).foreach(covered(_) = true)
    }
    val covChars = toks.zipWithIndex
      .collect { case (t, i) if covered(i) => t.length.toLong }.sum
    (units.size,
      if (units.nonEmpty) round4(dupUnits.toDouble / units.size) else 0.0,
      if (unitChars > 0) round4(dupChars.toDouble / unitChars) else 0.0,
      topFrac,
      if (toks.size >= 5 && tokChars > 0) round4(covChars.toDouble / tokChars)
      else 0.0)
  }

  test("repetitionStats kernel matches the brute-force reference on edge cases") {
    val cases = Seq(
      "",                                        // empty
      "one",                                     // single token, no units dup
      "a b c d e f g h",                         // no repetition at all
      "x x x x x x x x x x",                     // total repetition
      "line one\nline two\nline one\n\n  \nline two\nline three",
      "the cat sat\nthe cat sat\nthe cat sat",   // all lines identical
      "a b c d e a b c d e a b c d e",           // repeated 5-gram
      "aa bb aa bb aa bb cc")                    // dominant bigram
    val got = cases.toDF("text")
      .select(TextAnalysis.repetitionStats($"text", "\n").as("r"))
      .select($"r.n_units", $"r.dup_unit_frac", $"r.dup_unit_char_frac",
        $"r.top_bigram_char_frac", $"r.dup_5gram_char_frac")
      .as[(Int, Double, Double, Double, Double)].collect().toSeq
    assert(got === cases.map(refRepetition(_, "\n")))
  }

  test("repetitionStats kernel matches the reference over constructed corpus docs") {
    import graft.sources.Tables
    val docs = Tables.load(spark, sfDir, "documents")
      .filter($"doc_id" < 100)
      .select($"doc_id", concat_ws("\n", $"text", $"text", trim($"text")).as("d"))
    val got = docs
      .select($"doc_id", $"d", TextAnalysis.repetitionStats($"d", "\n").as("r"))
      .select($"doc_id", $"d", $"r.n_units", $"r.dup_unit_frac",
        $"r.dup_unit_char_frac", $"r.top_bigram_char_frac",
        $"r.dup_5gram_char_frac")
      .as[(Long, String, Int, Double, Double, Double, Double)].collect()
    got.foreach { case (id, d, a, b, c, e, f) =>
      assert((a, b, c, e, f) === refRepetition(d, "\n"), s"doc $id")
    }
    // custom delimiter: sentence-ish split on '.'
    val one = Seq("repeat me. and more. repeat me.").toDF("text")
      .select(TextAnalysis.repetitionStats($"text", ".").as("r"))
      .select($"r.n_units", $"r.dup_unit_frac")
      .as[(Int, Double)].head()
    assert(one === ((3, refRepetition("repeat me. and more. repeat me.", ".")._2)))
  }

  test("repetition_stats is callable from SQL with a literal delimiter") {
    graft.Graft.enable(spark)
    val r = spark.sql(
      """SELECT repetition_stats('x\ny\nx', '\n').dup_unit_frac AS f""")
    assert(r.as[Double].head() === 0.3333)
  }
}
