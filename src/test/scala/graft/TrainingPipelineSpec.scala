package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}
import graft.sources.{Ingest, Tables}

/** End-to-end training-data pipeline composition — the workload the
  * beyond-reference operators exist for, run as ONE chained job:
  * corpus → quality + language gate → exact dedup → near-dup dedup →
  * token/fingerprint projection → sorted segment write → re-read.
  * Asserts the invariants a real pipeline owner would: monotone row
  * counts, gate predicates actually hold downstream, no duplicate
  * fingerprints survive, and the segment round-trip is lossless. */
class TrainingPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("corpus flows through gates, dedup, stats, and a segment round-trip") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text")
    val total = docs.count()

    // stage 1: quality + language gate (codegen'd kernels)
    val gated = docs.filter(
      TextAnalysis.qualityScore($"text") >= 0.4 &&
      TextAnalysis.langId($"text") === "en")
    val nGated = gated.count()
    assert(nGated > 0 && nGated < total, s"gate vacuous: $nGated of $total")

    // stage 2: exact dedup (single shuffle, min-id survivor)
    val exact = Dedup.exactDedup(gated, "doc_id", "text")
    val nExact = exact.count()
    assert(nExact <= nGated)
    assert(exact.select(TextAnalysis.fingerprintMd5($"text")).distinct().count() === nExact,
      "exact dedup left duplicate fingerprints")

    // stage 3: near-dup dedup (LSH -> verify -> CC -> survivors)
    val clean = Dedup.nearDupDedup(exact, "doc_id", "text",
      threshold = 0.7, numHashes = 128, bands = 32, shingleSize = 2)
    val nClean = clean.count()
    assert(nClean <= nExact && nClean > 0)

    // stage 4: training-shard projection (stats + fingerprint)
    val shard = clean.select($"doc_id",
      TextAnalysis.tokenCount($"text").as("n_tokens"),
      TextAnalysis.bpeTokenEstimate($"text").as("bpe_est"),
      TextAnalysis.fingerprintMd5($"text").as("fp"),
      $"text")
    assert(shard.filter($"n_tokens" <= 0).count() === 0)

    // stage 5: sorted segment write + lossless re-read
    val seg = java.nio.file.Files.createTempDirectory("graft-shard")
      .toFile.getAbsolutePath
    Ingest.writeSegment(shard, Ingest.CompoundTransform(Nil), seg,
      sortBy = Seq("doc_id"))
    val back = spark.read.parquet(seg)
    assert(back.count() === nClean)
    assert(back.agg(sum(length($"text"))).as[Long].head() ===
      shard.agg(sum(length($"text"))).as[Long].head(), "segment round-trip lost data")

    // downstream gates still hold after the full chain
    assert(back.filter(TextAnalysis.langId($"text") =!= "en").count() === 0)
  }
}
