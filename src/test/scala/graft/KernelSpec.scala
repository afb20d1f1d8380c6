package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{GraftAggs, GraftFunctions, HashOps, TopKBuffer}
import graft.operators.TextAnalysis

class KernelSpec extends SparkSpec {
  import spark.implicits._

  test("kernel tokenize matches the Column tokens∘normalized path (incl. Unicode)") {
    val texts = Seq(
      "Hello　World extra",          // ideographic space: NOT a \s split
      "A\tB  c\nD\r\ne",                 // ASCII whitespace runs
      "ÀÉÎ øß Σ ＡＢＣ ﬁne",             // non-ASCII case mapping
      "  leading and trailing  ",
      "İstanbul I")                       // dotted capital I (locale trap)
    val colToks = texts.toDF("text")
      .select(TextAnalysis.tokens(TextAnalysis.normalized(col("text"))))
      .as[Seq[String]].collect()
    texts.zip(colToks).foreach { case (t, expected) =>
      val kernel = HashOps.tokenize(UTF8String.fromString(t)).toSeq
      assert(kernel === expected, s"parity broken for ${t.take(30)}")
    }
  }

  test("jsonGetLong matches CAST(get_json_object(...) AS BIGINT) incl. tricky inputs") {
    val cases = Seq(
      """{"k": 76}""",                      // the events.props shape
      """{"k":-12, "x": 3}""",              // negative, no spaces
      """{ "x" : 1 , "k" : 900719925474 }""", // later key, big value
      """{"kk": 5, "k": 7}""",              // prefix-colliding key name
      """{"s": "k", "t": "\"k\": 9"}""",    // key spelled inside string VALUES
      """{"nested": {"k": 3}, "other": 1}""", // k only at depth 2 => null
      """{"k": 1.5}""",                     // non-integer => null
      """{"k": "7"}""",                     // string-typed => null (not an int field)
      """{"k": 2e3}""",                     // exponent => null
      """{"x": 1}""",                       // absent => null
      """not json at all""",
      """[1, 2, 3]""",
      """{"k": 99999999999999999999}""",   // > Long.MaxValue => null, never a wrapped long
      """{"k": -99999999999999999999}""",  // < Long.MinValue => null
      """{"k": 9223372036854775807}""",    // Long.MaxValue exactly
      """{"k": -9223372036854775808}""")   // Long.MinValue exactly
    val df = cases.toDF("j")
    val got = df.select(GraftFunctions.jsonGetLong(col("j"), "k")).as[Option[Long]].collect()
    assert(got.toSeq === Seq(Some(76L), Some(-12L), Some(900719925474L), Some(7L),
      None, None, None, None, None, None, None, None,
      None, None, Some(Long.MaxValue), Some(Long.MinValue)))
    // parity with the built-in on the integer-valued cases
    val builtin = df.select(expr("try_cast(get_json_object(j, '$.k') AS long)")).as[Option[Long]].collect()
    got.zip(builtin).zip(cases).foreach { case ((g, b), c) =>
      // the builtin stringifies 1.5/2e3/"7" then casts; ours is stricter
      // (integer JSON fields only) — agreement is required where we return a value
      if (g.isDefined) assert(g === b, s"parity broken for $c")
    }
    // null input row => null
    assert(Seq(Option.empty[String]).toDF("j")
      .select(GraftFunctions.jsonGetLong(col("j"), "k")).as[Option[Long]].head().isEmpty)
  }

  test("vector kernels reject length mismatch and null elements loudly") {
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(GraftFunctions.cosine(col("a"), col("b"))).collect()
    }
    assert(e.getMessage != null)
    val dfNull = Seq((Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)))
      .toDF("a", "b")
    intercept[Exception] {
      dfNull.select(GraftFunctions.dot(col("a"), col("b"))).collect()
    }
  }

  test("l2Distance is stable for near-identical vectors and exact for knowns") {
    val a = Seq(1.0, 2.0, 3.0)
    val b = Seq(1.0, 2.0, 3.0 + 1e-9)
    val df = Seq((a, b)).toDF("a", "b")
    val d = df.select(GraftFunctions.l2Distance(col("a"), col("b"))).as[Double].head()
    assert(math.abs(d - 1e-9) < 1e-12, s"near-identical distance=$d (cancellation?)")
    val known = Seq((Seq(0.0, 0.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(GraftFunctions.l2Distance(col("a"), col("b"))).as[Double].head()
    assert(known === 5.0)
  }

  test("TopKBuffer keeps k best by (score desc, id asc) with ties") {
    val buf = new TopKBuffer(3)
    Seq((0.5, 10L), (0.9, 2L), (0.9, 1L), (0.1, 7L), (0.7, 5L), (0.9, 4L))
      .foreach { case (s, i) => buf.insert(s, i) }
    assert(buf.sortedBestFirst.toSeq === Seq((0.9, 1L), (0.9, 2L), (0.9, 4L)))
    // merge across "partitions" gives the same as a single pass
    val l = new TopKBuffer(2); val r = new TopKBuffer(2)
    Seq((0.3, 1L), (0.8, 2L)).foreach { case (s, i) => l.insert(s, i) }
    Seq((0.9, 3L), (0.5, 4L)).foreach { case (s, i) => r.insert(s, i) }
    r.foreachEntry((s, i) => l.insert(s, i))
    assert(l.sortedBestFirst.toSeq === Seq((0.9, 3L), (0.8, 2L)))
    // serde round-trip
    val back = TopKBuffer.deserialize(l.serialize, 2)
    assert(back.sortedBestFirst.toSeq === l.sortedBestFirst.toSeq)
  }

  test("topKByScore aggregate matches a row_number window") {
    import org.apache.spark.sql.expressions.Window
    val rng = new scala.util.Random(7)
    val rows = (1 to 500).map(i => (i % 13L, rng.nextInt(50) / 100.0, i.toLong))
    val df = rows.toDF("g", "score", "id")
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    val windowed = df.withColumn("rk", row_number().over(w)).filter($"rk" <= 4)
      .select($"g", $"id", $"score", $"rk")
      .as[(Long, Long, Double, Int)].collect().toSet
    val agged = df.groupBy($"g")
      .agg(GraftAggs.topKByScore($"score", $"id", 4).as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", $"col.id", $"col.score", ($"pos" + 1).as("rk"))
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(agged === windowed)
  }
}
