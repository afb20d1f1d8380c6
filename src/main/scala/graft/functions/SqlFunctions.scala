package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

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

  private type Builder = Seq[Expression] => Expression

  private val raw: Seq[(String, Builder)] = Seq[(String, Builder)](
    "simhash64" -> { case Seq(c) => exprs.SimHash64(c) : Expression },
    "cosine_sim" -> { case Seq(a, b) => exprs.CosineSim(a, b) },
    "dot_product" -> { case Seq(a, b) => exprs.DotProduct(a, b) },
    "l2_distance" -> { case Seq(a, b) => exprs.L2Distance(a, b) },
    "sig_agreement" -> { case Seq(a, b) => exprs.SigAgreement(a, b) },
    "lang_id" -> { case Seq(c) => exprs.LangId(c) },
    "quality_score" -> { case Seq(c) => exprs.QualityScore(c) },
    "text_stats" -> { case Seq(c) => exprs.TextStats(c) },
    "minhash_sig" -> { case Seq(c, n, s) =>
      exprs.MinHashSig(c, intLit(n, "numHashes"), intLit(s, "shingleSize")) },
    "lsh_bucket" -> { case Seq(c, p) => exprs.LshBucket(c, intLit(p, "numPlanes")) },
    "lsh_buckets" -> { case Seq(c, p, t) =>
      exprs.LshBuckets(c, intLit(p, "numPlanes"), intLit(t, "numTables")) })

  val all: Seq[(String, Builder)] = raw.map { case (name, pf) =>
    name -> { (args: Seq[Expression]) =>
      try pf(args)
      catch { case _: MatchError => throw new IllegalArgumentException(
        s"wrong argument count for $name (got ${args.length})") }
    }
  }
}
