package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic corpora for the LLM-pipeline scale bench —
  * the documents/embeddings analog of [[ScaleTable]]. Everything
  * derives from `xxhash64(id, seed, k)`, so any scale regenerates
  * bit-identically on any partitioning (codegen expressions only, no
  * driver-side data).
  *
  * Planted duplicate structure (per 50-id block starting at b):
  *  - id ≡ 1 (mod 50): EXACT duplicate of id−1 (same word sequence);
  *  - id ≡ 2 (mod 50): NEAR duplicate of id−2 (same words + one
  *    appended token → 3-shingle Jaccard ≈ (L−2)/(L−1) ≈ 0.97);
  *  - so each full block carries exactly 3 qualifying pairs at
  *    threshold 0.7 — (b, b+1) exact, (b, b+2) and (b+1, b+2) near —
  *    giving the near-dup pipeline a closed-form recall oracle at any
  *    scale. Random cross-block pairs share only accidental vocabulary
  *    and sit far below any useful threshold.
  */
object ScaleDocs {

  /** 1000-word vocabulary: 64 common-English stems × 16 suffix
    * variants (deterministic, compile-time). Real-looking enough for
    * the language/quality kernels to exercise their scoring paths. */
  private val stems = Seq(
    "the", "of", "and", "to", "in", "for", "is", "on", "that", "by",
    "this", "with", "you", "it", "not", "or", "be", "are", "from", "at",
    "as", "your", "all", "have", "new", "more", "an", "was", "we", "will",
    "home", "can", "us", "about", "if", "page", "my", "has", "search", "free",
    "but", "our", "one", "other", "do", "no", "information", "time", "they", "site",
    "he", "up", "may", "what", "which", "their", "news", "out", "use", "any",
    "there", "see", "only", "so")
  private val vocab: Seq[String] =
    (0 until 1000).map(i => stems(i % stems.size) +
      (if (i < stems.size) "" else (i / stems.size).toString))

  private val MaxWords = 50

  /** The generated documents frame (not yet written): doc_id, text,
    * lang, source, n_chars — the testdata `documents` schema. */
  def docsFrame(spark: SparkSession, rows: Long, seed: Long = 7L): DataFrame = {
    val id = col("id")
    def h(e: org.apache.spark.sql.Column, k: Int) = xxhash64(e, lit(seed), lit(k))
    // content seed: exact dups share it fully; near dups share it and
    // append one token below
    val base = when(pmod(id, lit(50)) === 1, id - 1)
      .when(pmod(id, lit(50)) === 2, id - 2).otherwise(id)
    val len = (lit(20) + pmod(h(base, 0), lit(MaxWords - 20))).cast("int")
    val vocabArr = array(vocab.map(lit): _*) // constant-folded
    val words = (1 to MaxWords).map(k =>
      element_at(vocabArr, (pmod(h(base, k), lit(1000)) + 1).cast("int")))
    val txt0 = array_join(slice(array(words: _*), lit(1), len), " ")
    val text = when(pmod(id, lit(50)) === 2,
      concat(txt0, lit(" zq"), pmod(id, lit(997)).cast("string"))).otherwise(txt0)
    spark.range(0, rows, 1, 64).select(
      id.as("doc_id"),
      text.as("text"),
      element_at(array(Seq("en", "de", "fr", "es").map(lit): _*),
        (pmod(h(id, 51), lit(4)) + 1).cast("int")).as("lang"),
      concat(lit("s"), pmod(id, lit(10)).cast("string")).as("source"),
      length(text).as("n_chars"))
  }

  /** Embeddings frame: vec_id, embedding (array<float> of `dim`
    * components), label. Vectors are a 16-center mixture — each row is
    * its label's center plus smaller per-row noise — because real
    * embedding spaces cluster; on uniform-random vectors an IVF index
    * has no structure to exploit and its recall measurement says
    * nothing about the operator. */
  def embeddingsFrame(spark: SparkSession, rows: Long, dim: Int = 64,
      seed: Long = 11L): DataFrame = {
    val id = col("id")
    def h(k: Int) = xxhash64(id, lit(seed), lit(k))
    val label = pmod(h(0), lit(16)).cast("int")
    def unit(e: org.apache.spark.sql.Column) =
      (pmod(e, lit(2000L)).cast("double") / 1000.0) - 1.0
    val comps = (1 to dim).map { k =>
      val center = unit(xxhash64(label, lit(seed + 1), lit(k)))
      val noise = unit(h(k))
      (center * 0.8 + noise * 0.45).cast("float")
    }
    spark.range(0, rows, 1, 64).select(
      id.as("vec_id"),
      array(comps: _*).as("embedding"),
      label.as("label"))
  }

  /** Marker check: the `_*_DONE` file records the row count it was
    * written for; a marker holding a DIFFERENT count means the dir was
    * populated at another size (a drifted ladder mapping, or a probe's
    * rows→dir map pointing at the wrong shared dir) — silently reusing
    * it would run the caller against wrong data, so regenerate. */
  private def markerRows(done: java.io.File): Option[Long] =
    if (!done.exists()) None
    else scala.util.Try(
      java.nio.file.Files.readAllLines(done.toPath).get(0).trim.toLong).toOption

  /** Generate-if-absent, marker-guarded like [[ScaleTable.ensure]];
    * a marker recording a different row count forces regeneration. */
  def ensureDocs(spark: SparkSession, dir: String, rows: Long): String = {
    val path = s"$dir/documents.parquet"
    val done = new java.io.File(s"$dir/_DOCS_DONE")
    if (!markerRows(done).contains(rows)) {
      docsFrame(spark, rows).write.mode("overwrite").parquet(path)
      done.getParentFile.mkdirs()
      java.nio.file.Files.write(done.toPath, java.util.Arrays.asList(rows.toString))
    }
    path
  }

  def ensureEmbeddings(spark: SparkSession, dir: String, rows: Long,
      dim: Int = 64): String = {
    val path = s"$dir/embeddings.parquet"
    val done = new java.io.File(s"$dir/_EMB_DONE")
    if (!markerRows(done).contains(rows)) {
      embeddingsFrame(spark, rows, dim).write.mode("overwrite").parquet(path)
      done.getParentFile.mkdirs()
      java.nio.file.Files.write(done.toPath, java.util.Arrays.asList(rows.toString))
    }
    path
  }

  /** The planted qualifying pairs (id_a < id_b) for `rows` documents —
    * the recall oracle's ground truth, enumerated from the block
    * structure, not re-derived from text. */
  def plantedPairs(spark: SparkSession, rows: Long): DataFrame = {
    import spark.implicits._
    spark.range(0, (rows + 49) / 50).select((col("id") * 50).as("b"))
      .select(explode(array(
        struct(col("b").as("id_a"), (col("b") + 1).as("id_b")),
        struct(col("b").as("id_a"), (col("b") + 2).as("id_b")),
        struct((col("b") + 1).as("id_a"), (col("b") + 2).as("id_b")))).as("p"))
      .select($"p.id_a", $"p.id_b")
      .filter($"id_b" < rows)
  }
}
