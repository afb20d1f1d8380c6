package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

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

  /** Per-side id-count ceiling for the EXPLICIT candidate-id broadcast
    * hints in the near-dup pipeline. The candidate universe grows
    * linearly with corpus size (6.6M ids at 10^8 docs ≈ 53 MB — fine;
    * ~6.6x10^8 ids at the 100x horizon ≈ 5+ GB), and an explicit hint
    * bypasses `autoBroadcastJoinThreshold` gating entirely — at that
    * size it OOMs the driver or trips Spark's 8 GB broadcast hard cap
    * no matter how well the banding is configured. Below the limit the
    * hint is pure win (no corpus-side shuffle write at all); at or
    * above it the semi-filter runs as a plain shuffle join whose cost
    * stays proportional to data, not driver memory. 50M ids ≈ 0.4 GB
    * of long keys — large for a broadcast but safely under executor
    * memory at any deployment size. */
  val BroadcastIdLimit: Long = 50000000L

  /** Left-semi-filter `frame` to rows whose `key` column appears in
    * `ids` (single column `_gid`). `knownIdBound` is an upper bound on
    * the id count when the caller has already materialized it (the
    * staged paths' eager funnel counts): at or under `broadcastIdLimit`
    * the build side gets an explicit broadcast hint, above it the join
    * is left un-hinted and shuffles. Lazy callers pass None — also
    * un-hinted, so the decision falls to AQE's RUNTIME size of the ids
    * side (broadcast when actually small, shuffle when not) instead of
    * a static hint that cannot know the scale it will run at. */
  private def semiFilterByIds(frame: DataFrame, key: String, ids: DataFrame,
      knownIdBound: Option[Long], broadcastIdLimit: Long): DataFrame = {
    val rhs = knownIdBound match {
      case Some(n) if n <= broadcastIdLimit => broadcast(ids)
      case _ => ids
    }
    frame.join(rhs, col(key) === col("_gid"), "left_semi")
  }

  /** DISTINCT word n-gram shingles of the normalized text (contiguous
    * n-token windows joined by single spaces), as a sorted array —
    * one codegen'd kernel call per document
    * ([[graft.functions.exprs.NGramShingles]]; the interpreted
    * `transform`+`slice` formulation this replaced was measured at
    * ~36 µs/shingle and dominated every Jaccard pipeline). */
  def shingles(text: Column, n: Int): Column =
    GraftFunctions.ngramShingles(text, n)

  /** MinHash signature via the custom codegen'd expression
    * ([[graft.functions.exprs.MinHashSig]]): one pass over the shingle
    * set with double-hashed XXH64 — O(shingles) hashing instead of the
    * O(shingles × numHashes) array rebuilds a higher-order-function
    * formulation costs (which dominated the round-1 benchmark). */
  def minhashSignature(text: Column, numHashes: Int, shingleSize: Int): Column =
    GraftFunctions.minhashSig(text, numHashes, shingleSize)

  /** Estimated Jaccard from two MinHash signatures: fraction of equal
    * components. */
  def minhashJaccard(sigA: Column, sigB: Column): Column =
    GraftFunctions.sigAgreement(sigA, sigB)

  /** LSH banding: explode a signature into (band, bandHash) rows.
    * Docs sharing any band-hash collide → candidates. bands must
    * divide the signature length. */
  def lshBands(df: DataFrame, idCol: String, sigCol: String, bands: Int,
      numHashes: Int): DataFrame = {
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    // Static per-band expressions: band b's hash is xxhash64 over its
    // r signature components read by direct array index — all longs,
    // fully codegen'd. The formulation this replaced built each band
    // key as a STRING (slice → cast every component to decimal text →
    // concat_ws → hash the string): at 10^8 docs × 16 bands that is
    // 1.6×10^9 transient strings of ~90 chars before hashing even
    // starts, and it measured as the dominant candidate-stage cost.
    // Hash identity differs from the string formulation; collision
    // structure (equal slices ⇒ equal hashes, 64-bit accidental rate)
    // is the same, so candidate pairs are unchanged.
    val r = numHashes / bands
    // static indexing hashes nulls silently on a width mismatch (the
    // dynamic slice of the old formulation degraded just as silently,
    // by mis-slicing) — fail loudly instead
    val checked = df.select(col(idCol),
      when(size(col(sigCol)) === numHashes, col(sigCol))
        .otherwise(raise_error(concat(
          lit(s"lshBands: signature width != $numHashes (got "),
          size(col(sigCol)).cast("string"), lit(")")))).as("_sig"))
    val sig = col("_sig")
    val bandHashes = (0 until bands).map { b =>
      xxhash64((0 until r).map(i => sig(b * r + i)): _*)
    }
    checked.select(col(idCol), posexplode(array(bandHashes: _*)))
      .toDF(idCol, "band", "band_hash")
  }

  /** MinHash-LSH near-duplicate candidate pairs with their estimated
    * Jaccard. One shuffle on (band, band_hash); pairs deduped with
    * id_a < id_b. */
  /** The `(id, sig)` signature frame — the stage a real pipeline
    * materializes ONCE per corpus (signatures are an ingest-time
    * artifact, like the reference's derived metric columns): the
    * banding self-join and the per-pair estimate both re-read the
    * signature frame, and over 10⁸ documents recomputing the
    * shingle+hash kernel on each side of a self-join would multiply
    * the dominant cost ×3-4. Write this to a segment and feed
    * [[candidatePairsFromSignatures]]. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, shingleSize: Int = 3): DataFrame =
    df.select(col(idCol),
      minhashSignature(col(textCol), numHashes, shingleSize).as("sig"))

  def minhashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3,
      minEstJaccard: Double = 0.5): DataFrame =
    // r12: the inline path used to SKIP the candidate-id semi-filter
    // (semiFilterSigs = false) because the id subtree re-executed the
    // banding — and with the inline text→minhash kernel as the
    // signature frame, every re-execution re-hashed the corpus
    // (measured 4× wall at sf0.1 when the filter was on). The raw pair
    // frame is now a lazy local checkpoint inside
    // [[candidatePairsFromSignatures]], so the id subtree reads
    // materialized blocks instead of re-running the banding: the
    // semi-filter is pure win on both paths and the flag is gone.
    candidatePairsFromSignatures(
      minhashSignatures(df, idCol, textCol, numHashes, shingleSize),
      idCol, numHashes, bands, minEstJaccard)

  /** LSH banding + estimate filter over a PRE-COMPUTED signature frame
    * (`(idCol, sig)` — the [[minhashSignatures]] shape, typically
    * re-read from a stored segment so the self-join never recomputes
    * text kernels).
    *
    * r12 plan shape: the raw pair frame is a LAZY local checkpoint.
    * Un-checkpointed, the pair subtree (band explode → self-join →
    * distinct, the pipeline's dominant shuffles) re-executes under
    * every consumer — once per est-join side's candidate-id branch and
    * once as the est join's left input, 3 evaluations per action
    * (measured 2.5→1.0 s on the sf0.1 near-dup oracle row from this
    * restructure plus [[verifyCandidates]]'s). A lazy checkpoint adds
    * NO job (the first action materializes it in passing, unlike the
    * staged path's eager `count()` barriers, which at oracle scale
    * cost more than the re-evaluation they save — measured 4.4 s vs
    * 1.9 s), and the blocks are ContextCleaner-owned: released when
    * the frame becomes unreachable, no caller-managed lifecycle. Size
    * is two longs per candidate pair — bounded by the LSH contract.
    * Trade-off: a checkpoint truncates lineage, so a lost executor
    * fails the job instead of recomputing (acceptable for the
    * one-shot/query path; the 100 TB deployment path is
    * [[nearDupPairsStagedCached]], whose persisted stages recompute
    * through lineage and whose eager counts gate the broadcasts). */
  def candidatePairsFromSignatures(withSig: DataFrame, idCol: String,
      numHashes: Int = 64, bands: Int = 16,
      minEstJaccard: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes); trailing signature " +
        "components would otherwise be silently dropped, weakening recall")
    val banded = lshBands(withSig, idCol, "sig", bands, numHashes)
    val a = banded.as("a")
    val b = banded.as("b")
    val pairs = a.join(b,
        col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
      .localCheckpoint(false)
    // The est-filter join needs signatures for CANDIDATE ids only, but
    // joining the raw signature frame shuffles every document's
    // signature array — at 10^8 docs × 64 hashes that is ~2× 50 GB of
    // shuffle for a candidate universe that the LSH contract keeps
    // orders of magnitude smaller. Semi-filter the signature frame by
    // the candidate-id set first (one exploded pass over the
    // checkpointed pairs, not a two-branch union that would evaluate
    // them twice). This lazy path cannot know the id count without
    // executing the banding subtree, so the semi-join is UN-hinted:
    // AQE sizes the materialized ids side at runtime and broadcasts
    // only when it is actually small — unlike a static broadcast
    // hint, which at the 100x horizon (~6.6x10^8 candidate ids ≈
    // 5+ GB) would bypass autoBroadcastJoinThreshold and OOM the
    // driver. The staged/cached path hint-gates on its eager candidate
    // count instead ([[candidatePairsStagedCached]]).
    val pairIds = pairs
      .select(explode(array(col("id_a"), col("id_b"))).as("_gid")).distinct()
    val sigs = semiFilterByIds(withSig.select(col(idCol), col("sig")),
        idCol, pairIds, knownIdBound = None, BroadcastIdLimit)
      .select(col(idCol), col("sig"))
    pairs
      .join(sigs.toDF("id_a", "sig_a"), "id_a")
      .join(sigs.toDF("id_b", "sig_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        round(minhashJaccard(col("sig_a"), col("sig_b")), 4).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
  }

  /** Exact n-gram Jaccard between two texts — one codegen'd kernel
    * call per pair ([[graft.functions.exprs.NGramJaccard]]; used to
    * verify LSH candidates, cost ∝ candidate count only). Rounded to
    * 4 places with Spark `round` semantics. */
  def ngramJaccard(textA: Column, textB: Column, n: Int): Column =
    GraftFunctions.ngramJaccard(textA, textB, n)

  /** Exact Jaccard of two pre-computed SORTED DISTINCT shingle arrays
    * (the [[shingles]] output shape) — the per-pair stage when shingle
    * sets are materialized once per document instead of re-tokenized
    * per pair. One merge-count kernel call per pair
    * ([[graft.functions.exprs.SortedJaccard]]) — no per-pair hash sets
    * or output arrays, which is what makes multi-million-candidate
    * verify stages affordable. */
  def setJaccard(shA: Column, shB: Column): Column =
    GraftFunctions.sortedJaccard(shA, shB)

  /** Full near-dup pipeline: LSH candidates → exact n-gram Jaccard
    * verification ≥ threshold. */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, numHashes: Int = 64, bands: Int = 16,
      shingleSize: Int = 3): DataFrame = {
    val cands = minhashCandidatePairs(df, idCol, textCol, numHashes, bands,
      shingleSize, minEstJaccard = threshold * 0.6)
    verifyCandidates(df, idCol, textCol, cands, threshold, shingleSize)
  }

  /** [[nearDupPairs]] over a PRE-COMPUTED signature segment: candidates
    * band-join the stored `(idCol, sig)` frame, exact verification
    * reads the documents once for shingle sets — the text kernel runs
    * one pass per document total, regardless of the join fan-out. */
  def nearDupPairsStaged(df: DataFrame, idCol: String, textCol: String,
      sigs: DataFrame, threshold: Double = 0.7, numHashes: Int = 64,
      bands: Int = 16, shingleSize: Int = 3): DataFrame = {
    val cands = candidatePairsFromSignatures(sigs, idCol, numHashes, bands,
      minEstJaccard = threshold * 0.6)
    verifyCandidates(df, idCol, textCol, cands, threshold, shingleSize)
  }

  /** Exact-Jaccard verification of candidate pairs: shingle sets
    * computed once per DOCUMENT (kernel), joined to the candidate
    * pairs — not re-tokenized per pair.
    *
    * Representation (r9): shingle sets travel as sorted
    * `array<bigint>` XXH64 hashes ([[GraftFunctions.shingleHashes]]),
    * not string arrays — Jaccard needs only element equality, and the
    * hashes are 3-5× fewer bytes, which is the verify stage's dominant
    * cost at 10^8 docs (the candidate docs' sets cache once and
    * shuffle through BOTH pair joins). Jaccard VALUES are unchanged
    * unless two distinct shingles collide in 64 bits (~|set|²/2^64 per
    * doc); parity with the string kernel is spec-pinned and the
    * planted-pair recall oracle rides every scale run. */
  private def verifyCandidates(df: DataFrame, idCol: String, textCol: String,
      cands: DataFrame, threshold: Double, shingleSize: Int): DataFrame = {
    // Shingle ONLY documents that appear in a candidate pair — the
    // whole point of LSH prefiltering is that this set is orders of
    // magnitude smaller than the corpus, so the verify stage's cost
    // (shingle kernel + the two pair joins' shuffles) must be
    // ∝ candidates, not ∝ corpus. Without this filter the shingle
    // arrays of ALL documents (several times the text's size) shuffle
    // through both joins: measured 50+ GB of shuffle at 10^8 docs
    // where the candidate set touched <10% of them.
    // Lazy path, id count unknown → un-hinted semi-join; AQE
    // runtime-sizes the id side (see [[semiFilterByIds]] — the id set
    // grows with the corpus, so a static broadcast hint is a 100x-
    // scale ceiling). The staged path gates on its eager count.
    //
    // r12: cands and docSh are lazy local checkpoints — both feed the
    // verify join on BOTH sides (docSh is keyed by id_a on one join
    // and id_b on the other, so exchange reuse can never unify them),
    // and cands additionally feeds the candidate-id subtree. Without
    // the checkpoints each consumer re-executed its whole upstream
    // (candidate generation 3×, the corpus shingle scan 2× per
    // action); with them the first action materializes each ONCE and
    // every consumer reads blocks. No extra job (lazy, unlike the
    // staged path's eager counts), ContextCleaner-owned lifecycle,
    // candidate-bounded size; lineage-truncation trade-off documented
    // on [[candidatePairsFromSignatures]].
    val candsC = cands.localCheckpoint(false)
    val candIds = candsC
      .select(explode(array(col("id_a"), col("id_b"))).as("_gid")).distinct()
    val docSh = semiFilterByIds(df, idCol, candIds, knownIdBound = None,
        BroadcastIdLimit)
      .select(col(idCol),
        GraftFunctions.shingleHashes(col(textCol), shingleSize).as("_sh"))
      .localCheckpoint(false)
    verifyJoin(candsC, docSh, threshold)
  }

  private def verifyJoin(cands: DataFrame, docSh: DataFrame,
      threshold: Double): DataFrame =
    cands
      .join(docSh.toDF("id_a", "_sh_a"), "id_a")
      .join(docSh.toDF("id_b", "_sh_b"), "id_b")
      .withColumn("jaccard",
        GraftFunctions.sortedJaccardHash(col("_sh_a"), col("_sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard", "jaccard")

  /** Verified pairs plus the intermediates the caller must release —
    * the [[connectedComponentsResult]] lifecycle pattern. */
  case class NearDupPairs(pairs: DataFrame, candidateCount: Long,
      private val cached: Seq[DataFrame]) {
    def unpersist(): Unit = { cached.foreach(_.unpersist()); () }
  }

  /** The staged candidate stage up to the RAW (pre-est-filter) pair
    * frame: window-pruned collision subset → self-join → distinct,
    * persisted and counted EAGERLY. The pair frame feeds three
    * consumers downstream (both branches of the id union and the est
    * join's left side — each would re-run the self-join over the
    * collision cache), it is small by the LSH contract (two longs per
    * candidate pair), and its count is the materialized bound that
    * gates the broadcast hints — the gate the lazy path cannot have.
    * Once it is materialized the collision cache has served its only
    * consumer and is released immediately, ahead of the memory-hungry
    * downstream stages (executor-loss recompute still works lazily
    * through the unpersisted lineage). Returns (pairs, nPairs,
    * persisted handles the caller must release). */
  private[graft] def candidatePairsStagedRaw(withSig: DataFrame, idCol: String,
      numHashes: Int, bands: Int): (DataFrame, Long, Seq[DataFrame]) = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes); trailing signature " +
        "components would otherwise be silently dropped, weakening recall")
    val banded = lshBands(withSig, idCol, "sig", bands, numHashes)
    val colliding = banded
      .withColumn("_n", count(lit(1)).over(
        Window.partitionBy(col("band"), col("band_hash"))))
      .filter(col("_n") >= 2).drop("_n")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val a = colliding.as("a")
    val b = colliding.as("b")
    val pairs = a.join(b,
        col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nPairs = pairs.count()
    colliding.unpersist()
    (pairs, nPairs, Seq(pairs))
  }

  /** Candidate generation for the STAGED/CACHED pipeline: the same
    * pairs and est values as [[candidatePairsFromSignatures]],
    * restructured around small persisted intermediates so the
    * dominant-volume work runs once per corpus pass — the raw pair
    * stage above, then the signature segment semi-filtered by the
    * candidate-id set ONCE into a persisted frame feeding both
    * est-join sides (the lazy shape scans + probes the full segment
    * once per side). The semi-filter is broadcast-hinted only while
    * the eager pair count bounds the id set under
    * [[BroadcastIdLimit]]; above it the filter shuffles (the id set
    * grows with the corpus, so an unconditional hint is a 100x-scale
    * driver-memory ceiling).
    *
    * Returns the candidate frame (NOT yet persisted — the caller
    * persists + eagerly counts it as the funnel metric) plus the
    * persisted intermediates for the [[NearDupPairs]] release hook.
    * Private to the cached path: persisting inside the lazy public
    * API would leak cache entries with no lifecycle owner. */
  private[graft] def candidatePairsStagedCached(withSig: DataFrame, idCol: String,
      numHashes: Int, bands: Int, minEstJaccard: Double,
      broadcastIdLimit: Long = BroadcastIdLimit)
      : (DataFrame, Seq[DataFrame]) = {
    import org.apache.spark.storage.StorageLevel
    val (pairs, nPairs, rawCached) =
      candidatePairsStagedRaw(withSig, idCol, numHashes, bands)
    val pairIds = pairs.select(col("id_a").as("_gid"))
      .union(pairs.select(col("id_b").as("_gid"))).distinct()
    // id bound: each pair contributes at most two distinct ids — the
    // over-estimate errs toward the shuffle branch, the safe direction
    val candSigs = semiFilterByIds(withSig.select(col(idCol), col("sig")),
        idCol, pairIds, knownIdBound = Some(2L * nPairs), broadcastIdLimit)
      .select(col(idCol), col("sig"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cands = pairs
      .join(candSigs.toDF("id_a", "sig_a"), "id_a")
      .join(candSigs.toDF("id_b", "sig_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        round(minhashJaccard(col("sig_a"), col("sig_b")), 4).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
    (cands, rawCached :+ candSigs)
  }

  /** [[nearDupPairsStaged]] with the two multiply-consumed stage
    * outputs materialized instead of recomputed.
    *
    * The lazy formulation evaluates the candidate-generation subtree
    * (band explode + self-join + distinct + two signature joins — the
    * expensive shuffles of the whole pipeline) THREE times per action:
    * once under each branch of the candidate-id union and once as the
    * final join's left side; the shingled-docs subtree (corpus scan +
    * semi-join + shingle kernel) twice. Fine for one-shot oracle
    * queries at toy scale, a 2-3× wall-time multiplier on a 10^8-row
    * corpus. Here the candidate pairs (small by the LSH contract) and
    * the candidate shingle sets persist MEMORY_AND_DISK; candidates
    * are materialized eagerly (the count doubles as the funnel
    * metric), so every downstream consumer reads the cache.
    *
    * Callers own the lifecycle: `unpersist()` after the pairs frame
    * is consumed. */
  def nearDupPairsStagedCached(df: DataFrame, idCol: String, textCol: String,
      sigs: DataFrame, threshold: Double = 0.7, numHashes: Int = 64,
      bands: Int = 16, shingleSize: Int = 3,
      broadcastIdLimit: Long = BroadcastIdLimit): NearDupPairs = {
    import org.apache.spark.storage.StorageLevel
    val (candsRaw, stageCached) = candidatePairsStagedCached(sigs, idCol,
      numHashes, bands, minEstJaccard = threshold * 0.6, broadcastIdLimit)
    val cands = candsRaw.persist(StorageLevel.MEMORY_AND_DISK)
    // eager: guarantees the subtree runs once even though the first
    // lazy consumer would be the two-branch union below
    val nCands = cands.count()
    // the stage intermediates existed only to make the candidate
    // subtree run once; with cands materialized they would sit in
    // MEMORY_AND_DISK through the verify stage — the pipeline's most
    // memory-hungry phase — for nothing. Release now; executor-loss
    // recompute of lost cands partitions still works lazily.
    stageCached.foreach(_.unpersist())
    val candIds = cands.select(col("id_a").as("_gid"))
      .union(cands.select(col("id_b").as("_gid"))).distinct()
    // the eager funnel count doubles as the broadcast gate (ids ≤
    // 2 × candidate pairs; the over-estimate errs toward shuffle)
    val docSh = semiFilterByIds(df, idCol, candIds,
        knownIdBound = Some(2L * nCands), broadcastIdLimit)
      .select(col(idCol),
        GraftFunctions.shingleHashes(col(textCol), shingleSize).as("_sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    NearDupPairs(verifyJoin(cands, docSh, threshold), nCands,
      Seq(cands, docSh))
  }

  /** EXACT n-gram Jaccard similarity join — the deterministic,
    * no-false-negatives counterpart of [[nearDupPairs]] (whose MinHash
    * candidate stage is probabilistic): every pair with distinct
    * n-gram Jaccard ≥ `threshold`, nothing missed, nothing spurious.
    *
    * Scale design — PREFIX FILTERING (the classic exact-similarity-
    * join technique: order every document's shingles by a global
    * rarity order, keep only the first |S| − ⌈t·|S|⌉ + 1 as the join
    * prefix; for any pair with Jaccard ≥ t, the globally-smallest
    * common shingle provably sits inside BOTH prefixes — its position
    * in each set is ≤ |S| − |A∩B| + 1 and |A∩B| ≥ ⌈t·|S|⌉ — so
    * joining prefixes alone finds every qualifying pair):
    *  - the candidate join keys on prefix shingles only, and prefixes
    *    keep the RAREST shingles (global document-frequency order), so
    *    join fan-out is bounded by rare-shingle co-occurrence — the
    *    frequent shingles that would explode an all-shingles join
    *    never reach it;
    *  - at threshold 0 the prefix is the whole set (graceful, but the
    *    caller should use [[minhashCandidatePairs]] there);
    *  - verification is exact Jaccard on candidates only, cost ∝
    *    candidates;
    *  - the global order is fully deterministic: (document frequency,
    *    seeded shingle hash, shingle), so retries reproduce.
    * Shuffles: shingle document-frequency (1), per-doc ranking window
    * keyed by the unique doc id (1, skew-free), candidate join (1),
    * verify joins (∝ candidates). */
  def jaccardSimilarityJoin(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.7): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    import org.apache.spark.sql.expressions.Window
    // Candidate-stage bound slack, two parts, BOTH subtracted so the
    // filters can only be weaker than the exact real-number bound —
    // pruning too little costs a few extra verifications, pruning too
    // much silently loses qualifying pairs:
    //  - 5e-5: the verify stage accepts ROUNDED Jaccard ≥ t (4
    //    decimals, matching the oracle), so a pair with true Jaccard
    //    down to t − 0.00005 can round up to t and must still reach
    //    verification;
    //  - 1e-9: IEEE slack — t/(1+t)·(|A|+|B|) evaluated in doubles can
    //    overshoot the exact real product (e.g. 0.4/1.4·7 →
    //    2.0000000000000004, whose ceil wrongly demands overlap 3),
    //    which would violate exactness for many (t, size) combos.
    val tSlack = threshold - 5e-5 - 1e-9
    val sh = df.select(col(idCol).as("_id"),
        shingles(col(textCol), n).as("_sh"))
      .withColumn("_size", size(col("_sh")))
    val exploded = sh.select(col("_id"), col("_size"), explode(col("_sh")).as("_s"))
    val dfreq = exploded.groupBy(col("_s")).agg(count(lit(1)).as("_df"))
    val prefix = exploded.join(dfreq, "_s")
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col("_id"))
          .orderBy(col("_df"), xxhash64(col("_s")), col("_s"))))
      .filter(col("_rk") <= col("_size") - ceil(lit(tSlack) * col("_size")) + 1)
      .select(col("_id"), col("_s"), col("_rk"), col("_size"))
    val a = prefix.toDF("id_a", "_s", "_rk_a", "_size_a")
    val b = prefix.toDF("id_b", "_s", "_rk_b", "_size_b")
    // POSITIONAL filter (PPJoin): for the smallest common shingle in
    // the global order, every other common shingle ranks after it in
    // BOTH sets, so overlap ≤ 1 + min(|A|-rk_a, |B|-rk_b); Jaccard ≥ t
    // needs overlap ≥ t/(1+t)·(|A|+|B|) — compared directly against
    // the real-valued bound (no ceil: rounding up from a float product
    // is exactly the overshoot hazard above); pairs can only be pruned
    // at non-smallest matches, so no qualifying pair is lost.
    val minOverlap = lit(tSlack / (1 + tSlack)) *
      (col("_size_a") + col("_size_b"))
    val cands = a.join(b,
        a("_s") === b("_s") && col("id_a") < col("id_b") &&
        (lit(1) + least(col("_size_a") - col("_rk_a"),
          col("_size_b") - col("_rk_b"))).cast("double") >= minOverlap)
      .select(col("id_a"), col("id_b"))
      .distinct()
      .localCheckpoint(false)
    // r12: verify-stage shingle sets for CANDIDATE docs only — the
    // unfiltered form shuffled EVERY document's shingle array (several
    // times the text's size) through both pair joins, the exact flaw
    // the MinHash pipeline's verify stage fixed in r9. The candidate
    // pairs are a lazy checkpoint (they feed the id subtree and the
    // verify join; un-checkpointed, the whole prefix-filter join would
    // re-execute under each — same trade-off as [[verifyCandidates]]).
    // docSh itself is deliberately NOT checkpointed: its two join-side
    // evaluations are candidate-bounded after the semi-filter, and
    // keeping the shingle kernel in the visible plan is what lets
    // PlanAuditSpec assert no interpreted shingling crept back in.
    val candIds = cands
      .select(explode(array(col("id_a"), col("id_b"))).as("_gid")).distinct()
    val docSh = sh.select(col("_id"), col("_sh"))
      .join(candIds, col("_id") === col("_gid"), "left_semi")
      .select(col("_id"), col("_sh"))
    cands
      .join(docSh.toDF("id_a", "_sh_a"), "id_a")
      .join(docSh.toDF("id_b", "_sh_b"), "id_b")
      .withColumn("jaccard", setJaccard(col("_sh_a"), col("_sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Embedding-cosine near-duplicate pairs: OR-amplified multi-table
    * LSH self-join generates candidates (cost ∝ bucket collisions, not
    * |corpus|²), exact cosine verifies ≥ `simThreshold`. The embedding
    * analogue of [[nearDupPairs]] — candidate generation by hash
    * collision, verification exact, everything deterministic. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      simThreshold: Double, numPlanes: Int = 4, numTables: Int = 8): DataFrame = {
    val bucketed = df.select(col(idCol).as("_id"), col(vecCol).as("_vec"),
      posexplode(GraftFunctions.lshBuckets(col(vecCol), numPlanes, numTables))
        .as(Seq("_table", "_bucket")))
    val a = bucketed.toDF("id_a", "vec_a", "_table", "_bucket")
    val b = bucketed.toDF("id_b", "vec_b", "_table", "_bucket")
    a.join(b, Seq("_table", "_bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(GraftFunctions.cosine(col("vec_a"), col("vec_b")), 6).as("sim"))
      .distinct()
      .filter(col("sim") >= simThreshold)
  }

  /** Winnowing rolling-hash fingerprint overlap: |A ∩ B| / |A| — the
    * containment of doc A's sampled k-gram hashes in doc B
    * ([[TextAnalysis.winnowingFingerprint]]). */
  def winnowOverlap(fpA: Column, fpB: Column): Column =
    when(size(fpA) > 0,
      size(array_intersect(fpA, fpB)).cast("double") / size(fpA).cast("double"))
      .otherwise(lit(0.0))

  /** Connected components over a near-dup pair list by iterative
    * min-label propagation: every node takes the minimum label among
    * itself and its neighbors until fixpoint (≤ graph diameter
    * iterations, each one shuffle — the standard distributed CC that
    * needs no graph library). Near-dup graphs are almost entirely
    * tiny cliques/chains, so this converges in 1-2 rounds in
    * practice; `maxIter` bounds adversarial chains. Returns
    * (id, component) with component = min id reachable.
    *
    * The returned frame is persisted (it was materialized by the
    * convergence checks and is one row per edge-touched node — tiny
    * relative to the corpus); callers running many dedups in one
    * session should `unpersist()` via the [[CcLabels]] handle when
    * done. Throws if the loop exits at `maxIter` without reaching
    * fixpoint — partially-propagated labels would silently keep
    * multiple "survivors" from one cluster. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    val r = connectedComponentsResult(pairs, maxIter)
    if (!r.converged) {
      r.unpersist()
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter iterations " +
          "(a component's diameter exceeds maxIter); raise maxIter")
    }
    r.labels
  }

  /** Label frame + convergence metadata for [[connectedComponents]];
    * `unpersist()` releases the cached labels once the caller has
    * consumed them (long sessions running many dedups). */
  final case class CcLabels(labels: DataFrame, converged: Boolean, iterations: Int) {
    def unpersist(): Unit = { labels.unpersist(); () }
  }

  /** As [[connectedComponents]] but never throws: returns the labels
    * with an explicit `converged` flag and an unpersist hook. */
  def connectedComponentsResult(pairs: DataFrame, maxIter: Int = 10): CcLabels = {
    val spark = pairs.sparkSession
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .persist()
    var i = 0
    var converged = false
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("component", "_nl"),
          Seq("dst"))
        .groupBy(col("src")).agg(min(col("_nl")).as("_nmin"))
        .withColumnRenamed("src", "id")
      val updated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("_nmin"), col("component")))
            .as("component"))
        .persist()
      val changed = updated.join(labels.withColumnRenamed("component", "_old"), Seq("id"))
        .filter(col("component") =!= col("_old")).count()
      labels.unpersist()
      labels = updated
      converged = changed == 0
      i += 1
    }
    edges.unpersist()
    CcLabels(labels, converged, i)
  }

  /** End-to-end near-dup DEDUP: pair generation ([[nearDupPairs]]) →
    * clustering ([[connectedComponents]]) → keep the min-id survivor
    * per cluster (docs in no cluster survive untouched). The complete
    * "pairs are not a dedup" step a training-data pipeline actually
    * runs. */
  def nearDupDedup(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, numHashes: Int = 128, bands: Int = 32,
      shingleSize: Int = 3): DataFrame = {
    // verified pairs checkpoint lazily: [[connectedComponentsResult]]
    // consumes them under BOTH branches of its edge union, which would
    // run the verify joins twice (r12; same pattern and trade-off as
    // [[verifyCandidates]] — pair-bounded size, no extra job)
    val pairs = nearDupPairs(df, idCol, textCol, threshold, numHashes, bands,
      shingleSize).localCheckpoint(false)
    val comps = connectedComponents(pairs)
    df.join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .filter(col("component").isNull || col("component") === col(idCol))
      .drop("component")
  }

  /** SimHash-64: sign-aggregated bitwise hash of the token multiset.
    * Near-dup docs differ in few bits (Hamming distance). Single-pass
    * codegen'd kernel ([[graft.functions.exprs.SimHash64]]) — no UDF,
    * no shuffle, stays inside whole-stage codegen. */
  def simhash64(text: Column): Column = GraftFunctions.simhash64(text)

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact dedup: keep one row per distinct normalized-text
    * fingerprint, surviving row = min id in the group.
    *
    * ONE shuffle, one scan: `groupBy(fingerprint).agg(min_by(row, id))`
    * — the survivor is selected inside the aggregation, so map-side
    * partial aggregation keeps at most one candidate row per
    * fingerprint per partition before the shuffle, and there is no
    * second scan or semi-join probe re-hashing the full text (the
    * round-2 formulation paid both).
    *
    * Keys on the 128-bit md5 fingerprint: at pretraining scale
    * (billions of docs) a 64-bit key has substantial birthday-collision
    * probability (~0.4 at 4B docs) and would silently drop distinct
    * documents; 128 bits puts collisions below 1e-18 at that scale. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cols = df.columns.toSeq
    df.groupBy(TextAnalysis.fingerprintMd5Bin(col(textCol)).as("_fp"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("_survivor"))
      .select(cols.map(c => col("_survivor").getField(c).as(c)): _*)
  }

  /** Exact-dedup SURVIVOR IDS only: the slim form of [[exactDedup]]
    * for pipelines that materialize a survivor-id segment (the common
    * shape at corpus scale — dedup once, then filter any number of
    * downstream reads against the id set) or only need the survivor
    * count.
    *
    * Same single-scan, single-shuffle plan, but the shuffle carries
    * `(16-byte fingerprint, id)` instead of [[exactDedup]]'s full-row
    * struct — at 10^8 × ~200-byte documents that is the difference
    * between shuffling ~2.4 GB and shuffling the whole corpus, and the
    * full-row struct is pure waste when the caller drops every payload
    * column anyway. Output: one column `idCol`, the min id per
    * distinct normalized-text fingerprint. */
  def exactDedupIds(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(TextAnalysis.fingerprintMd5Bin(col(textCol)).as("_fp"), col(idCol))
      .groupBy(col("_fp"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
}
