package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact dedup,
  * MinHash+LSH near-dup candidate generation, SimHash, and exact
  * n-gram Jaccard verification.
  *
  * Scale design (the point, per the brief):
  *  - signatures/fingerprints are pure `Column` expressions → computed
  *    map-side, once, with no driver involvement;
  *  - candidate generation is a single self-equi-join on
  *    (band, bandHash) — a shuffle keyed by a hash, which distributes
  *    uniformly by construction (no skew salting needed: band hashes of
  *    near-uniform text are near-uniform);
  *  - verification (exact Jaccard) runs only on candidate pairs, i.e.
  *    cost ∝ |near-dups|, not |corpus|²;
  *  - everything is deterministic (seeded xxhash64), so re-runs and
  *    retries (task re-execution at scale!) produce identical results.
  */
object Dedup {

  /** Word n-gram shingles of the normalized text: contiguous n-token
    * windows joined by a single space. */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(TextAnalysis.normalized(text))
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - lit(n)),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the minimum xxhash64 over the shingle set. Seeding via a literal
    * prefix keeps it a single codegen'd expression (xxhash64 has no
    * seed arg at the Column API level). */
  def minhashSignature(text: Column, numHashes: Int, shingleSize: Int): Column = {
    val sh = array_distinct(shingles(text, shingleSize))
    val funcs = (0 until numHashes).map { seed =>
      array_min(transform(sh, s => xxhash64(lit(seed), s)))
    }
    array(funcs: _*)
  }

  /** Estimated Jaccard from two MinHash signatures: fraction of equal
    * components. */
  def minhashJaccard(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (a, b) => a === b), x => x))
      .cast("double") / size(sigA).cast("double")

  /** LSH banding: explode a signature into (band, bandHash) rows.
    * Docs sharing any band-hash collide → candidates. bands must
    * divide the signature length. */
  def lshBands(df: DataFrame, idCol: String, sigCol: String, bands: Int): DataFrame = {
    val sig = col(sigCol)
    val rows = (size(sig) / lit(bands)).cast("int")
    df.select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",", transform(
            slice(sig, b * rows + lit(1), rows), _.cast("string")))))))
      .toDF(idCol, "band", "band_hash")
  }

  /** MinHash-LSH near-duplicate candidate pairs with their estimated
    * Jaccard. One shuffle on (band, band_hash); pairs deduped with
    * id_a < id_b. */
  def minhashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3,
      minEstJaccard: Double = 0.5): DataFrame = {
    val withSig = df.select(col(idCol),
      minhashSignature(col(textCol), numHashes, shingleSize).as("sig"))
    val banded = lshBands(withSig, idCol, "sig", bands)
    val a = banded.as("a")
    val b = banded.as("b")
    val pairs = a.join(b,
        col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
    val sigs = withSig.select(col(idCol), col("sig"))
    pairs
      .join(sigs.toDF("id_a", "sig_a"), "id_a")
      .join(sigs.toDF("id_b", "sig_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        round(minhashJaccard(col("sig_a"), col("sig_b")), 4).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
  }

  /** Exact n-gram Jaccard between two texts (used to verify LSH
    * candidates; cost ∝ candidate count only). */
  def ngramJaccard(textA: Column, textB: Column, n: Int): Column = {
    val sa = array_distinct(shingles(textA, n))
    val sb = array_distinct(shingles(textB, n))
    val inter = size(array_intersect(sa, sb)).cast("double")
    val union = size(array_union(sa, sb)).cast("double")
    when(union > 0, round(inter / union, 4)).otherwise(lit(0.0))
  }

  /** Full near-dup pipeline: LSH candidates → exact n-gram Jaccard
    * verification ≥ threshold. */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, numHashes: Int = 64, bands: Int = 16,
      shingleSize: Int = 3): DataFrame = {
    val cands = minhashCandidatePairs(df, idCol, textCol, numHashes, bands,
      shingleSize, minEstJaccard = threshold * 0.6)
    val texts = df.select(col(idCol), col(textCol))
    cands
      .join(texts.toDF("id_a", "text_a"), "id_a")
      .join(texts.toDF("id_b", "text_b"), "id_b")
      .withColumn("jaccard", ngramJaccard(col("text_a"), col("text_b"), shingleSize))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard", "jaccard")
  }

  /** SimHash-64: sign-aggregated bitwise hash of the token multiset.
    * Near-dup docs differ in few bits (Hamming distance). Built from
    * higher-order functions only: one pass over tokens accumulating 64
    * signed counters, then bit reconstruction — no UDF, no shuffle. */
  def simhash64(text: Column): Column = {
    val toks = TextAnalysis.tokens(TextAnalysis.normalized(text))
    val bitIdx = sequence(lit(0), lit(63))
    val counters = aggregate(
      toks,
      transform(bitIdx, _ => lit(0L)),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, bitIdx,
          (a, i) => a + when(
            call_function("shiftright", h, i.cast("int")).bitwiseAND(1) === 1, 1L)
            .otherwise(-1L))
      })
    aggregate(
      zip_with(counters, bitIdx, (c, i) => when(c > 0,
        call_function("shiftleft", lit(1L), i.cast("int"))).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact dedup: keep one row per distinct normalized-text
    * fingerprint. Window-free formulation — groupBy(fingerprint) +
    * min(id) then semi-join keeps it a pair of hash shuffles that
    * scale linearly (vs a global sort a window would need). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = df.withColumn("_fp", TextAnalysis.fingerprint64(col(textCol)))
    val keep = fp.groupBy(col("_fp")).agg(min(col(idCol)).as(idCol))
    fp.join(keep, Seq("_fp", idCol), "left_semi").drop("_fp")
  }
}
