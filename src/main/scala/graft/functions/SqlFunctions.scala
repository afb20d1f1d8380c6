package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.Decimal

/** SQL-facing builders for the custom expressions, so `spark.sql`
  * users get the same functions as the Column API — the engine's
  * analogue of the reference registering its transform functions by
  * name (`TransformFunctionFactory.java:43-50`). Static parameters
  * (hash counts, plane counts) are taken from integer literals at the
  * call site and baked into the expression (they parameterize codegen,
  * not per-row input). */
object SqlFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def stringLit(e: Expression, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def doubleLit(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
    case Literal(v: Decimal, _) => v.toDouble
    case Literal(v: Int, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  private type Builder = Seq[Expression] => Expression

  private val raw: Seq[(String, Builder)] = Seq[(String, Builder)](
    "simhash64" -> { case Seq(c) => exprs.SimHash64(c) : Expression },
    "cosine_sim" -> { case Seq(a, b) => exprs.CosineSim(a, b) },
    "dot_product" -> { case Seq(a, b) => exprs.DotProduct(a, b) },
    "l2_distance" -> { case Seq(a, b) => exprs.L2Distance(a, b) },
    "cosine_sim_packed" -> { case Seq(a, b) => exprs.CosineSimPacked(a, b) },
    "dot_product_packed" -> { case Seq(a, b) => exprs.DotProductPacked(a, b) },
    "l2_distance_packed" -> { case Seq(a, b) => exprs.L2DistancePacked(a, b) },
    "pack_floats" -> { case Seq(v) => exprs.PackFloats(v) },
    "unpack_floats" -> { case Seq(v) => exprs.UnpackFloats(v) },
    "sig_agreement" -> { case Seq(a, b) => exprs.SigAgreement(a, b) },
    "lang_id" -> { case Seq(c) => exprs.LangId(c) },
    "quality_score" -> { case Seq(c) => exprs.QualityScore(c) },
    "lang_quality" -> { case Seq(c) => exprs.LangQuality(c) },
    "md5_normalized" -> { case Seq(c) => exprs.Md5Normalized(c) },
    "text_stats" -> { case Seq(c) => exprs.TextStats(c) },
    "token_count" -> { case Seq(c) => exprs.TokenCount(c) },
    "normalize_ws" -> { case Seq(c) => exprs.NormalizeWs(c) },
    "repetition_stats" -> { case Seq(c, d) =>
      exprs.RepetitionStats(c, stringLit(d, "delim")) },
    "minhash_sig" -> { case Seq(c, n, s) =>
      exprs.MinHashSig(c, intLit(n, "numHashes"), intLit(s, "shingleSize")) },
    "lsh_bucket" -> { case Seq(c, p) => exprs.LshBucket(c, intLit(p, "numPlanes")) },
    "lsh_buckets" -> { case Seq(c, p, t) =>
      exprs.LshBuckets(c, intLit(p, "numPlanes"), intLit(t, "numTables")) },
    "winnow_fingerprint" -> { case Seq(c, k, w) =>
      exprs.WinnowFingerprint(c, intLit(k, "k"), intLit(w, "w")) },
    "ngram_shingles" -> { case Seq(c, n) =>
      exprs.NGramShingles(c, intLit(n, "shingleSize")) },
    "ngram_jaccard" -> { case Seq(a, b, n) =>
      exprs.NGramJaccard(a, b, intLit(n, "shingleSize")) },
    "sorted_jaccard" -> { case Seq(a, b) => exprs.SortedJaccard(a, b) },
    "json_get_long" -> { case Seq(c, f) =>
      exprs.JsonGetLong(c, stringLit(f, "field")) },
    // media header kernels (binary → typed metadata structs)
    "image_meta" -> { case Seq(c) => exprs.ImageMeta(c) },
    "audio_meta" -> { case Seq(c) => exprs.AudioMeta(c) },
    "video_meta" -> { case Seq(c) => exprs.VideoMeta(c) },
    // aggregates: the analyzer wraps a returned AggregateFunction in
    // its AggregateExpression, same as Spark's own registry builders
    "quantile_sketch_agg" -> { case Seq(c, e) =>
      qsketch.QuantileSketchAgg(c, doubleLit(e, "eps")) },
    "quantile_sketch_union_agg" -> { case Seq(c) =>
      qsketch.QuantileSketchUnionAgg(c) },
    "quantile_sketch_estimate" -> { case Seq(c, f) =>
      qsketch.QuantileSketchEstimate(c, doubleLit(f, "fraction")) })

  val all: Seq[(String, Builder)] = raw.map { case (name, pf) =>
    name -> { (args: Seq[Expression]) =>
      try pf(args)
      catch { case _: MatchError => throw new IllegalArgumentException(
        s"wrong argument count for $name (got ${args.length})") }
    }
  }
}
