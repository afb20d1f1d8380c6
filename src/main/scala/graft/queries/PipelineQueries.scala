package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Multi-value column semantics (SURVEY §2.3 MV aggregates, §2.7
  * valueIn) plus the training-data pipeline operators (dedup,
  * similarity search, text analysis) over the `documents` /
  * `embeddings` / `events` tables. Same oracle-parity conventions as
  * CoreQueries.
  */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  // ---- multi-value column semantics ------------------------------------

  /** countMV (CountMVAggregationFunction): per-row array lengths summed
    * — `sum(size(col))`, no explode needed. */
  def qMvCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "embeddings")
      .groupBy($"label")
      .agg(count(lit(1)).as("cnt"), sum(size($"embedding")).as("mv_total"))
      .orderBy($"label")
  }

  /** sumMV/minMV/maxMV/avgMV via explode — exactly the reference's MV
    * group-by semantics (one group entry per array element,
    * DefaultGroupByExecutor.aggregateGroupByMV). */
  def qMvAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "embeddings")
      .select($"label", explode($"embedding").as("e"))
      .groupBy($"label")
      .agg(
        count(lit(1)).as("n_elems"),
        round(sum($"e".cast("double")), 4).as("sum_e"),
        round(min($"e".cast("double")), 4).as("min_e"),
        round(max($"e".cast("double")), 4).as("max_e"),
        round(avg($"e".cast("double")), 4).as("avg_e"))
      .orderBy($"label")
  }

  /** minMaxRangeMV + distinctCountMV (the remaining MV aggregation
    * variants): explode semantics over the array column. */
  def qMvRangeDc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "embeddings")
      .select($"label", explode($"embedding").as("e"))
      .groupBy($"label")
      .agg(
        round(max($"e".cast("double")) - min($"e".cast("double")), 4).as("range_e"),
        countDistinct($"e").as("dc_e"))
      .orderBy($"label")
  }

  /** Multimodal column plumbing ([[graft.operators.Multimodal]]):
    * text bytes stand in for media blobs; `byte_len` is byte-exact
    * cross-engine metadata, the stub features/frames prove the
    * binary-column pipeline shape with hash-dependent invariants. */
  def qMediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Multimodal
    t(s, dir, "documents")
      .filter($"doc_id" < 100)
      .select($"doc_id",
        Multimodal.asMedia(encode($"text", "UTF-8"), lit("text/plain")).as("media"))
      .select($"doc_id",
        $"media.byte_len".as("byte_len"),
        Multimodal.stubFeatures($"media.content", 8).as("f"),
        Multimodal.frameSample($"media.content", 4).as("frames"))
      .select($"doc_id", $"byte_len",
        (size($"f") === 8).as("dims_ok"),
        forall($"f", x => x >= 0 && x < 1).as("range_ok"),
        (size($"frames") === 4).as("frames_ok"))
      .orderBy($"doc_id")
  }

  /** Image-header metadata over a REAL generated-PNG fixture: each row
    * synthesizes a valid PNG ([[graft.operators.Multimodal.makePng]],
    * spec-level container: IHDR/IDAT/IEND + CRCs) with dimensions that
    * are pure functions of doc_id, and the query recovers
    * (format, width, height) from the BYTES via the header kernel
    * ([[graft.functions.MediaOps.imageMeta]]) inside asMedia — so the
    * DuckDB oracle can recompute the expected dims arithmetically and
    * a hash match proves the byte-level parse, not a copied column.
    * The encode UDF is fixture plumbing; the operator under test is
    * the codegen'd header parse. */
  def qMediaMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Multimodal
    val mkPng = udf((id: Long) =>
      Multimodal.makePng(1 + (id % 64).toInt, 1 + (id * 7 % 48).toInt, id.toInt))
    t(s, dir, "documents")
      .filter($"doc_id" < 100)
      .select($"doc_id", Multimodal.asMedia(mkPng($"doc_id"), lit("image/png")).as("media"),
        Multimodal.imageMeta(mkPng($"doc_id")).as("meta"))
      .select($"doc_id",
        $"meta.format".as("format"),
        $"media.width".as("width"),
        $"media.height".as("height"))
      .orderBy($"doc_id")
  }

  /** Audio-container metadata over a REAL generated-WAV fixture: each
    * row synthesizes a valid PCM16 RIFF/WAVE blob
    * ([[graft.operators.Multimodal.makeWav]] — "fmt " + "data" chunks,
    * spec-level container) with sample rate and frame count that are
    * pure functions of doc_id, and the query recovers
    * (format, sample_rate, channels, bits, duration_ms) from the BYTES
    * via the header kernel ([[graft.functions.MediaOps.audioMeta]]) —
    * the DuckDB oracle recomputes the expected fields arithmetically
    * (duration_ms = frames * 1000 / rate for PCM16 mono), so a hash
    * match proves the byte-level chunk walk. The encode UDF is fixture
    * plumbing; the operator under test is the codegen'd header parse. */
  def qAudioMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Multimodal
    val mkWav = udf((id: Long) =>
      Multimodal.makeWav(8000 + (id % 5).toInt * 4000, 1000 + (id * 13 % 3000).toInt, id.toInt))
    t(s, dir, "documents")
      .filter($"doc_id" < 100)
      .select($"doc_id", Multimodal.audioMeta(mkWav($"doc_id")).as("meta"))
      .select($"doc_id",
        $"meta.format".as("format"),
        $"meta.sample_rate".as("sample_rate"),
        $"meta.channels".as("channels"),
        $"meta.bits".as("bits"),
        $"meta.duration_ms".as("duration_ms"))
      .orderBy($"doc_id")
  }

  /** Video-container metadata over a REAL generated-MP4 fixture: each
    * row synthesizes a minimal valid ISO-BMFF container
    * ([[graft.operators.Multimodal.makeMp4]] — ftyp + moov[mvhd +
    * trak[tkhd]] + mdat) whose dimensions/duration are pure functions
    * of doc_id, and the query recovers (format, width, height,
    * duration_ms) from the BYTES via the box-walk kernel
    * ([[graft.functions.MediaOps.videoMeta]]) — the DuckDB oracle
    * recomputes the expected fields arithmetically, so a hash match
    * proves the byte-level box walk. */
  def qVideoMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Multimodal
    val mkMp4 = udf((id: Long) =>
      Multimodal.makeMp4(16 + (id % 240).toInt * 8, 16 + (id * 3 % 120).toInt * 9,
        1000L + (id * 77) % 9000))
    t(s, dir, "documents")
      .filter($"doc_id" < 100)
      .select($"doc_id", Multimodal.videoMeta(mkMp4($"doc_id")).as("meta"))
      .select($"doc_id",
        $"meta.format".as("format"),
        $"meta.width".as("width"),
        $"meta.height".as("height"),
        $"meta.duration_ms".as("duration_ms"))
      .orderBy($"doc_id")
  }

  /** percentileN-MV / percentileEstN-MV / percentileTDigestN-MV
    * (Percentile{,Est,TDigest}MVAggregationFunction.java): the
    * reference collects every element of the array column into the
    * same value buffer its SV twin uses — explode + the SV aggregate
    * is the Spark mapping. Exact percentiles are oracle-matched
    * (DuckDB `quantile_cont` uses the same linear interpolation);
    * the sketch variants are pinned by a deviation bound against the
    * exact answer, the q_percentile_approx pattern. */
  def qMvPercentile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // r12: exploded MV elements are NEAR-UNIQUE doubles (measured
    // 127,898 distinct of 128,000 at sf0.1 — the old "few distinct
    // values" comment was wrong), so the exact side's distinct
    // (label, value) histogram degenerated to the exploded data
    // itself. Grouped rank-narrowing selection is the right plan for
    // that shape (≤64 label groups, near-unique values); values are
    // bit-identical to Percentiles.exact (same rank arithmetic and
    // interpolation, probed on q_percentile_approx's switch).
    val elems = t(s, dir, "embeddings")
      .select($"label", explode($"embedding").as("e0"))
      .select($"label", $"e0".cast("double").as("e"))
    val exact = graft.operators.Percentiles.rankSelectKeyed(
      elems, Seq("label"), "e",
      Seq(graft.operators.Percentiles.Spec(0.5, "_pe1", nearestRank = false),
        graft.operators.Percentiles.Spec(0.9, "_pe2", nearestRank = false)))
    val approx = elems
      .groupBy($"label")
      .agg(expr("approx_percentile(e, array(0.5, 0.9), 10000)").as("_pa"))
    exact.join(approx, Seq("label"))
      .select($"label",
        round($"_pe1", 4).as("p50_e"),
        round($"_pe2", 4).as("p90_e"),
        (abs(element_at($"_pa", 1) - $"_pe1")
          <= abs($"_pe1") * 0.02 + lit(1e-3)).as("p50_ok"),
        (abs(element_at($"_pa", 2) - $"_pe2")
          <= abs($"_pe2") * 0.02 + lit(1e-3)).as("p90_ok"))
      .orderBy($"label")
  }

  /** valueIn (ValueInTransformFunction.java:51): filter an MV column's
    * elements to a literal set, then group on the surviving values. */
  def qMvValueIn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = Seq("scan", "join", "filter", "the")
    t(s, dir, "documents")
      .select($"lang", explode(
        filter(split($"text", " "), w => w.isin(words.map(x => x: Any): _*)))
        .as("word"))
      .groupBy($"lang", $"word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"lang", $"word")
  }

  // ---- text analysis ---------------------------------------------------

  def qTextStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("cnt"),
        round(avg($"n_chars"), 3).as("avg_chars"),
        min($"n_chars").as("min_chars"),
        max($"n_chars").as("max_chars"))
      .orderBy($"lang", $"source")
  }

  /** Token counting: whitespace tokens, distinct tokens, and the
    * BPE-ish subword estimate (TextAnalysis.bpeTokenEstimate). */
  def qTokenStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id",
        TextAnalysis.tokenCount($"text").as("n_tokens"),
        size(array_distinct(TextAnalysis.tokens($"text"))).as("n_distinct"),
        TextAnalysis.bpeTokenEstimate($"text").as("bpe_est"))
      .orderBy($"doc_id")
  }

  /** Language ID (stopword-profile argmax) vs the labeled lang —
    * confusion counts. */
  def qLangId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"lang", TextAnalysis.langId($"text").as("lang_pred"))
      .groupBy($"lang", $"lang_pred")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"lang", $"lang_pred")
  }

  /** Quality scoring rollup per source. */
  def qQuality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"source", TextAnalysis.qualityScore($"text").as("q"),
        TextAnalysis.qualityMetrics($"text").getField("stopword_ratio").as("sw"))
      .groupBy($"source")
      .agg(count(lit(1)).as("cnt"),
        round(avg($"q"), 3).as("avg_score"),
        round(avg($"sw"), 3).as("avg_stopword"))
      .orderBy($"source")
  }

  /** Fused language-ID + quality scoring: the per-document filter
    * stage a pretraining pipeline runs (keep lang, threshold quality),
    * evaluated through the single-pass [[TextAnalysis.langQuality]]
    * kernel — one text scan per row where the unfused pair
    * ([[qLangId]] + [[qQuality]]) each pay their own. */
  def qLangQuality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select(TextAnalysis.langQuality($"text").as("lq"))
      .groupBy($"lq.lang".as("lang_pred"))
      .agg(count(lit(1)).as("cnt"),
        round(avg($"lq.quality"), 3).as("avg_q"))
      .orderBy($"lang_pred")
  }

  /** Document fingerprinting (md5 of normalized text — portable across
    * engines) + distinct-fingerprint counts per lang. */
  def qFingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // fingerprint projected ONCE before the aggregate: the md5 kernel
    // runs per row, not per aggregate reference (the agg-embedded form
    // hashed every document twice and pushed full text through the
    // distinct-agg Expand; this pushes only (lang, 32-char fp))
    t(s, dir, "documents")
      .select($"lang", TextAnalysis.fingerprintMd5($"text").as("_fp"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("cnt"),
        countDistinct($"_fp").as("distinct_fp"),
        min($"_fp").as("min_fp"))
      .orderBy($"lang")
  }

  /** Exact dedup operator: rows surviving Dedup.exactDedup per lang. */
  def qDedupExact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.exactDedup(t(s, dir, "documents"), "doc_id", "text")
      .groupBy($"lang")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"lang")
  }

  /** Slim exact-dedup: survivor-ID segment build
    * ([[Dedup.exactDedupIds]] — the (fingerprint, id) shuffle with no
    * payload columns), checked by aggregate invariants of the id set
    * (count/sum/min/max pin the exact set without shipping every id
    * through the compare). */
  def qDedupIds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.exactDedupIds(t(s, dir, "documents"), "doc_id", "text")
      .agg(count(lit(1)).as("n_survivors"),
        sum($"doc_id").as("sum_id"),
        min($"doc_id").as("min_id"),
        max($"doc_id").as("max_id"))
  }

  /** JSON extraction (superset of the reference's ingest-time UDFs):
    * bucket events by the JSON payload's k field. */
  def qJsonExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // single-field codegen kernel instead of from_json/get_json_object:
    // both of those pay a Jackson parse per row; the byte-level scanner
    // ([[graft.functions.HashOps.jsonGetLong]]) extracts the one
    // integer field inside whole-stage codegen with zero allocation
    t(s, dir, "events")
      .select(floor(graft.functions.GraftFunctions.jsonGetLong($"props", "k")
        / lit(10)).as("k_bucket"), $"value")
      .groupBy($"k_bucket")
      .agg(count(lit(1)).as("cnt"), round(sum($"value"), 3).as("sum_value"))
      .orderBy($"k_bucket")
  }

  // ---- similarity search ----------------------------------------------

  /** Brute-force exact cosine top-k (the ANN correctness baseline).
    * Query vector = embedding of vec_id 0, collected as a query
    * parameter (1 row), then inlined as a literal into the scan. */
  def qKnnBrute(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    Similarity.bruteForceKnn(emb, "vec_id", "embedding", q, 10)
  }

  /** Brute-force top-k over the PACKED float32 vector layout (the
    * fixed-width raw-forward-index analog,
    * `segment/index/readers/forward/FixedByteChunkSVForwardIndexReader`
    * family): embeddings pack to one binary cell per row, the cosine
    * kernel reads floats straight out of the byte[] (no per-element
    * ArrayData accessor), and the float→double widening matches the
    * array kernel bit-for-bit — so this shares [[qKnnBrute]]'s oracle
    * verbatim. The packed column is what a 100 TB embedding store
    * would persist; here it packs in the scan (the layout is the
    * contract under test, not the segment build). */
  def qKnnPacked(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), Similarity.packVector(col("embedding")).as("emb_p"))
    val q = emb.filter(col("vec_id") === 0)
      .select(col("emb_p")).head().getAs[Array[Byte]](0)
    val df = Similarity.bruteForceKnn(emb, "vec_id", "emb_p",
      graft.functions.HashOps.unpackFloats(q).toFloatArray().toSeq, 10)
    val plan = df.queryExecution.executedPlan.toString
    require(plan.contains("cosine_sim_packed"),
      s"packed knn must score through the packed kernel:\n$plan")
    df
  }

  /** knn-join: 3 nearest corpus vectors for each of 5 query vectors
    * (broadcast query side, un-shuffled corpus). Queries ⊆ corpus here,
    * so excludeSelf is valid. */
  def qKnnJoin(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.knnJoin(emb.filter(col("vec_id") < 5), "vec_id",
      emb, "vec_id", "embedding", 3, excludeSelf = true)
      .orderBy(col("query_id"), col("rk"))
  }

  /** Deterministic near-duplicate universe both engines can enumerate:
    * docs with ≥30 whitespace tokens (doc_id < 200) paired with a
    * perturbed copy of themselves — the same text minus its first two
    * tokens. The perturbed copy is a REAL near-duplicate (high n-gram
    * Jaccard), and the doc filter is plain SQL, so the DuckDB oracle
    * can reproduce the exact row universe while Spark proves
    * hash-dependent invariants over it. */
  private def perturbedDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .filter($"doc_id" < 200 && size(TextAnalysis.tokens($"text")) >= 30)
      .select($"doc_id", $"text",
        array_join(slice(TextAnalysis.tokens($"text"), 3, 1000000), " ").as("pert"))
  }

  /** LSH-bucketed ANN self-oracle: per query (vec_id < 20), did the
    * OR-amplified LSH path recover ≥2 of the exact top-3 neighbors?
    * Both LSH and brute force are deterministic (seeded planes), so
    * `recall_ok` is a reproducible boolean the DuckDB oracle expects
    * to be uniformly true. */
  def qLshAnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter($"vec_id" < 20)
    val k = 3
    // exact top-k feeds BOTH the hit join and the per-query count —
    // un-checkpointed, the brute-force corpus scan ran twice per
    // action (r12; lazy checkpoint: ≤ k rows per query, no extra job)
    val exact = Similarity.knnJoin(queries, "vec_id", emb, "vec_id",
        "embedding", k, excludeSelf = true)
      .select($"query_id", $"corpus_id")
      .localCheckpoint(false)
    val approx = Similarity.lshBucketedKnn(queries, "vec_id", emb, "vec_id",
        "embedding", k, numPlanes = 4, numTables = 32, excludeSelf = true)
      .select($"query_id", $"corpus_id")
    val hits = exact.join(approx, Seq("query_id", "corpus_id"))
      .groupBy($"query_id").agg(count(lit(1)).as("hits"))
    exact.groupBy($"query_id").agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("query_id"), "left")
      .select($"query_id",
        (coalesce($"hits", lit(0L)) >= 2).as("recall_ok"),
        ($"n_exact" === k).as("k_ok"))
      .orderBy($"query_id")
  }

  private val ivfSeg = new SessionCache[(Similarity.IvfModel, String)]

  /** IVF ANN self-oracle: overall recall of the inverted-file path
    * (16-cell deterministic codebook, 8 probes) across the 20-query
    * set must be ≥ 40% of the exact top-3 sets — chance level is
    * 3/|corpus| per query, so this is a real index-quality bar while
    * honest about IVF's hardest regime (near-uniform embeddings,
    * where per-query guarantees need nprobe → k; the LSH path holds
    * the stronger per-query ≥2-of-3 bar). Aggregate form: a single
    * deterministic row both engines can state.
    *
    * Codebook training + cell assignment are SEGMENT-BUILD artifacts
    * (the reference builds its indexes at segment creation, not per
    * query), so like the star-tree and sketch segments they are built
    * once per (session, table): the model is deterministic (seeded
    * init, fixed Lloyd rounds) and the assigned corpus is persisted
    * with its `ivf_cell` column; queries read the pre-assigned
    * segment and probe. */
  def qIvfAnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter($"vec_id" < 20)
    val k = 3
    // the 100 TB shape: codebook from a 10% seeded sample, cell column
    // materialized once with the segment, probe joins against it
    val (model, segPath) = ivfSeg.getOrElseUpdate(s, s"ivf|$dir") {
      val m = Similarity.ivfTrain(emb, "vec_id", "embedding", k = 16,
        iters = 2, sampleFraction = 0.1)
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_" +
        TmpTag(dir)
      Similarity.ivfAssign(emb, "embedding", m)
        .write.mode("overwrite").parquet(out)
      (m, out)
    }
    val assigned = s.read.parquet(segPath)
    val exact = Similarity.knnJoin(queries, "vec_id", emb, "vec_id",
        "embedding", k, excludeSelf = true)
      .select($"query_id", $"corpus_id")
    val approx = Similarity.ivfKnn(queries, "vec_id", assigned, "vec_id",
        "embedding", k, model, nprobe = 8, excludeSelf = true,
        cellCol = Some("ivf_cell"))
      .select($"query_id", $"corpus_id", lit(1).as("hit"))
    // PER-QUERY recall bar (the qLshAnn standard, upgraded from the
    // r3-era aggregate-only 40%): with nprobe=8 of 16 cells every
    // query must recover at least one of its exact top-3 — seeded
    // codebook + assignment make this deterministic per SF (verified
    // at sf0.001 and sf0.01)
    exact.join(approx, Seq("query_id", "corpus_id"), "left")
      .groupBy($"query_id")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce($"hit", lit(0))).as("hits"))
      .select($"query_id", $"n_exact", ($"hits" >= 1).as("recall_ok"))
      .orderBy($"query_id")
  }

  // ---- near-duplicate detection self-oracles ---------------------------

  /** MinHash estimator + LSH banding verified on the perturbed-copy
    * universe: `est_ok` = the 128-hash MinHash Jaccard estimate is
    * within 0.25 of the exact bigram Jaccard (binomial sd ≈ 0.044 —
    * a >5σ margin); `found_ok` = every pair with exact Jaccard ≥ 0.7
    * was surfaced as an LSH banding candidate (32 bands × 4 rows ⇒
    * miss probability 1.5e-4 per pair, and the seeded hashing makes
    * the outcome reproducible, not merely probable). */
  def qMinhashPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the (doc, pert) fixture feeds the estimate frame and both corpus
    // union branches — lazy checkpoint so the token-slice kernels run
    // once per action, not 3× (bounded: doc_id < 200 at every SF)
    val base = perturbedDocs(s, dir).localCheckpoint(false)
    val withJ = base.select($"doc_id",
      Dedup.minhashJaccard(
        Dedup.minhashSignature($"text", 128, 2),
        Dedup.minhashSignature($"pert", 128, 2)).as("est"),
      Dedup.ngramJaccard($"text", $"pert", 2).as("exact"))
    val corpus = base.select($"doc_id", $"text")
      .union(base.select(($"doc_id" + 1000000).as("doc_id"), $"pert".as("text")))
    val found = Dedup.minhashCandidatePairs(corpus, "doc_id", "text",
        numHashes = 128, bands = 32, shingleSize = 2, minEstJaccard = 0.0)
      .filter($"id_b" === $"id_a" + 1000000)
      .select($"id_a".as("doc_id"), lit(true).as("found"))
    withJ.join(found, Seq("doc_id"), "left")
      .select($"doc_id",
        (abs($"est" - $"exact") <= 0.25).as("est_ok"),
        ($"exact" < 0.7 || coalesce($"found", lit(false))).as("found_ok"))
      .orderBy($"doc_id")
  }

  /** Full near-dup pipeline self-oracle (LSH candidates → exact n-gram
    * Jaccard verify): every perturbed pair with exact Jaccard ≥ 0.7
    * must come out of [[Dedup.nearDupPairs]] with the SAME verified
    * Jaccard value the oracle-visible direct computation gives. */
  def qNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // same bounded-fixture checkpoint as qMinhashPairs (union branches
    // + exact side would otherwise re-run the token kernels per branch)
    val base = perturbedDocs(s, dir).localCheckpoint(false)
    val corpus = base.select($"doc_id", $"text")
      .union(base.select(($"doc_id" + 1000000).as("doc_id"), $"pert".as("text")))
    val found = Dedup.nearDupPairs(corpus, "doc_id", "text", threshold = 0.7,
        numHashes = 128, bands = 32, shingleSize = 2)
      .filter($"id_b" === $"id_a" + 1000000)
      .select($"id_a".as("doc_id"), $"jaccard", lit(true).as("found"))
    base.select($"doc_id", Dedup.ngramJaccard($"text", $"pert", 2).as("exact"))
      .join(found, Seq("doc_id"), "left")
      .select($"doc_id",
        ($"exact" < 0.7 || coalesce($"found", lit(false))).as("found_ok"),
        ($"exact" < 0.7 ||
          abs(coalesce($"jaccard", lit(-1.0)) - $"exact") <= 0.0001).as("jac_ok"))
      .orderBy($"doc_id")
  }

  /** End-to-end near-dup DEDUP with a full external oracle: the test
    * corpus contains genuinely planted near-duplicate documents, and
    * the DuckDB oracle independently recomputes the exact ground
    * truth — bigram-Jaccard ≥ 0.7 pairs, connected components via a
    * recursive CTE, survivors = per-component min ids — so the entire
    * Spark pipeline (MinHash LSH candidates → exact verify →
    * min-label clustering → survivor filter) must reproduce the exact
    * survivor set. */
  def qDedupCluster(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // nearDupDedup reads the universe for signatures, verify shingles,
    // and the survivor join — checkpoint the bounded fixture once
    val universe = t(s, dir, "documents")
      .filter($"doc_id" < 200 && size(TextAnalysis.tokens($"text")) >= 30)
      .select($"doc_id", $"text")
      .localCheckpoint(false)
    Dedup.nearDupDedup(universe, "doc_id", "text",
        threshold = 0.7, numHashes = 128, bands = 32, shingleSize = 2)
      .select($"doc_id")
      .orderBy($"doc_id")
  }

  /** Heavy hitters — frequent-token analysis (vocabulary skew, stopword
    * discovery) with a Count-Min sketch cross-check. The exact top-20
    * is a two-phase count + bounded top-k (DuckDB-verified); the CMS is
    * built DISTRIBUTED by Spark's `count_min_sketch` aggregate (partial
    * sketches merge map-side — fixed-size state regardless of
    * vocabulary), then the driver probes it for just the 20 winners (a
    * bounded model-object read, the qKnnBrute pattern). CMS guarantees
    * pinned as invariants: never underestimates; overestimates by at
    * most eps·N (deterministic for a fixed seed + dataset, so the
    * booleans are stable, not flaky). */
  def qHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = t(s, dir, "documents")
      .select(explode(TextAnalysis.tokens($"text")).as("tok"))
    val exact = toks.groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"tok").limit(20)
    val eps = 0.001
    val skBytes = toks
      .agg(count_min_sketch($"tok", lit(eps), lit(0.99), lit(42)).as("sk"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(skBytes))
    val bound = math.ceil(eps * cms.totalCount()).toLong
    val probed = exact.collect().toSeq.map { r =>
      val (tok, cnt) = (r.getString(0), r.getLong(1))
      val est = cms.estimateCount(tok)
      (tok, cnt, est >= cnt, est <= cnt + bound)
    }
    probed.toDF("tok", "cnt", "no_underestimate", "bound_ok")
      .orderBy($"cnt".desc, $"tok")
  }

  /** Deterministic content-addressed sampling
    * ([[graft.operators.Sampling]]): the 10% document sample is decided
    * by an md5 hash of the key, so the EXACT sampled row set is
    * engine-independent — the DuckDB oracle recomputes the identical
    * predicate and must select the identical rows (unlike
    * `df.sample()`, whose row set silently changes with partitioning).
    * A reproducible sample is what makes ablations and train/test
    * splits auditable in a training pipeline. */
  def qHashSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Sampling
    Sampling.hashSample(t(s, dir, "documents"), "doc_id", 0.1)
      .groupBy($"lang")
      .agg(count(lit(1)).as("cnt"), min($"doc_id").as("min_id"),
        sum($"n_chars").as("sum_chars"))
      .orderBy($"lang")
  }

  /** Standalone EXACT n-gram Jaccard similarity join
    * ([[Dedup.jaccardSimilarityJoin]], prefix filtering) with a full
    * external oracle: DuckDB recomputes ALL-PAIRS bigram Jaccard over
    * the same bounded universe, so the entire prefix-filter machinery
    * (rarity order, prefix truncation, candidate join, exact verify)
    * must reproduce the exact pair set AND the exact Jaccard values —
    * any false negative from a wrong prefix bound breaks the match. */
  def qJaccardJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // r12: same bounded-fixture checkpoint as qDedupCluster — the
    // similarity join's plan reads its input universe from FOUR
    // subtrees (prefix explode, doc-frequency, and both verify join
    // sides), so un-checkpointed the parquet scan + token-filter
    // kernel ran 4× per action. The shingle kernels themselves stay in
    // the visible plan (PlanAuditSpec), only the scan is pinned.
    val universe = t(s, dir, "documents")
      .filter($"doc_id" < 200 && size(TextAnalysis.tokens($"text")) >= 30)
      .select($"doc_id", $"text")
      .localCheckpoint(false)
    Dedup.jaccardSimilarityJoin(universe, "doc_id", "text", n = 2, threshold = 0.7)
      .orderBy($"id_a", $"id_b")
  }

  /** Embedding-cosine near-dup self-oracle: each vector paired with a
    * deterministic perturbed copy of itself (every 16th component
    * zeroed → cosine ≈ 0.97); [[Dedup.embeddingNearDups]] over the
    * doubled corpus must surface every (v, v') pair whose exact cosine
    * is ≥ 0.9. */
  def qEmbedNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = t(s, dir, "embeddings").filter($"vec_id" < 100)
      .select($"vec_id", $"embedding")
    val pert = emb.select(($"vec_id" + 1000000).as("vec_id"),
      zip_with($"embedding", sequence(lit(0), size($"embedding") - 1),
        (x, i) => when(pmod(i, lit(16)) === 0, lit(0.0f)).otherwise(x)).as("embedding"))
    val corpus = emb.union(pert)
    val found = Dedup.embeddingNearDups(corpus, "vec_id", "embedding",
        simThreshold = 0.9, numPlanes = 4, numTables = 8)
      .filter($"id_b" === $"id_a" + 1000000)
      .select($"id_a".as("vec_id"), lit(true).as("found"))
    emb.join(pert.select(($"vec_id" - 1000000).as("vec_id"), $"embedding".as("pvec")),
        Seq("vec_id"))
      .select($"vec_id", Similarity.cosine($"embedding", $"pvec").as("sim"))
      .join(found, Seq("vec_id"), "left")
      .select($"vec_id",
        ($"sim" < 0.9 || coalesce($"found", lit(false))).as("found_ok"))
      .orderBy($"vec_id")
  }

  /** Winnowing fingerprint self-oracle: self-overlap is exactly 1, the
    * 2-token-drop near-dup keeps high overlap (shared suffix ≫ k+w-1),
    * and fingerprints are compact (≤ ~2·len/w samples). */
  def qWinnow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    perturbedDocs(s, dir)
      .select($"doc_id",
        TextAnalysis.winnowingFingerprint($"text").as("fp_t"),
        TextAnalysis.winnowingFingerprint($"pert").as("fp_p"),
        length($"text").as("len"))
      .select($"doc_id",
        (Dedup.winnowOverlap($"fp_t", $"fp_t") === 1.0).as("self_ok"),
        (Dedup.winnowOverlap($"fp_p", $"fp_t") >= 0.5).as("near_ok"),
        (size($"fp_t") > 0 && size($"fp_t") <= $"len").as("size_ok"))
      .orderBy($"doc_id")
  }

  /** Repetition quality metrics ([[TextAnalysis.repetitionStats]] —
    * the Gopher-style repetition filters) on a constructed 3-line doc
    * `text\npert\ntext`: the unit (line) metrics are generically
    * recomputed by the DuckDB oracle (dup occurrences beyond first,
    * by count and by characters); the n-gram metrics are pinned by
    * structure — every 5-gram window fully inside any of the three
    * lines also occurs in another line (text repeats, and pert's
    * token sequence is a suffix of text's), so EVERY token position
    * is covered by a duplicated window: `dup_5gram_char_frac` must be
    * exactly 1.0, and the duplicated text makes every text bigram
    * repeat, so `top_bigram_char_frac` is in (0, 1]. */
  def qRepetition(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = perturbedDocs(s, dir)
      .select($"doc_id", trim($"text").as("text"), $"pert")
    base
      .select($"doc_id", TextAnalysis.repetitionStats(
        concat_ws("\n", $"text", $"pert", $"text"), "\n").as("r"))
      .select($"doc_id",
        $"r.n_units".as("n_units"),
        $"r.dup_unit_frac".as("dup_unit_frac"),
        $"r.dup_unit_char_frac".as("dup_unit_char_frac"),
        ($"r.top_bigram_char_frac" > 0.0 &&
          $"r.top_bigram_char_frac" <= 1.0).as("top2_ok"),
        ($"r.dup_5gram_char_frac" === 1.0).as("dup5_ok"))
      .orderBy($"doc_id")
  }

  /** SimHash self-oracle on the perturbed-copy universe: identical
    * text hashes identically (`self_ok`), a 2-token-drop near-dup
    * stays within a generous Hamming radius (`near_ok` — measured max
    * ≤ 12 at both SFs, bound 24), and the distance is a valid 64-bit
    * Hamming value (`range_ok`). */
  def qSimhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    perturbedDocs(s, dir)
      .select($"doc_id",
        Dedup.hamming64(Dedup.simhash64($"text"), Dedup.simhash64($"text")).as("self_ham"),
        Dedup.hamming64(Dedup.simhash64($"text"), Dedup.simhash64($"pert")).as("pert_ham"))
      .select($"doc_id",
        ($"self_ham" === 0).as("self_ok"),
        ($"pert_ham" <= 24).as("near_ok"),
        ($"pert_ham" >= 0 && $"pert_ham" <= 64).as("range_ok"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mv_count" -> qMvCount,
    "q_mv_agg" -> qMvAgg,
    "q_mv_valuein" -> qMvValueIn,
    "q_mv_range_dc" -> qMvRangeDc,
    "q_mv_percentile" -> qMvPercentile,
    "q_media_features" -> qMediaFeatures,
    "q_media_meta" -> qMediaMeta,
    "q_audio_meta" -> qAudioMeta,
    "q_video_meta" -> qVideoMeta,
    "q_text_stats" -> qTextStats,
    "q_token_stats" -> qTokenStats,
    "q_lang_id" -> qLangId,
    "q_quality" -> qQuality,
    "q_lang_quality" -> qLangQuality,
    "q_fingerprint" -> qFingerprint,
    "q_dedup_exact" -> qDedupExact,
    "q_dedup_ids" -> qDedupIds,
    "q_json_extract" -> qJsonExtract,
    "q_knn_brute" -> qKnnBrute,
    "q_knn_packed" -> qKnnPacked,
    "q_knn_join" -> qKnnJoin,
    "q_lsh_ann" -> qLshAnn,
    "q_ivf_ann" -> qIvfAnn,
    "q_minhash_pairs" -> qMinhashPairs,
    "q_near_dup" -> qNearDup,
    "q_hash_sample" -> qHashSample,
    "q_heavy_hitters" -> qHeavyHitters,
    "q_jaccard_join" -> qJaccardJoin,
    "q_dedup_cluster" -> qDedupCluster,
    "q_embed_neardup" -> qEmbedNearDup,
    "q_winnow" -> qWinnow,
    "q_repetition" -> qRepetition,
    "q_simhash" -> qSimhash)

  // Shared SQL fragments for the oracles.
  private val toksSql =
    """list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0)"""
  private val normSql =
    """regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"""
  private def cosSql(a: String, b: String) =
    s"""(list_aggregate(list_transform(list_zip($a, $b),
       |   s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum')
       | / (sqrt(list_aggregate(list_transform($a,
       |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
       |  * sqrt(list_aggregate(list_transform($b,
       |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))))""".stripMargin

  private val langProfilesSql: Seq[(String, String)] =
    TextAnalysis.stopwordProfiles.map { case (lang, prof) =>
      lang -> prof.map(w => s"'$w'").mkString("(", ",", ")")
    }

  val oracles: Map[String, String] = Map(
    "q_mv_count" ->
      """SELECT label, count(*) AS cnt, CAST(sum(len(embedding)) AS BIGINT) AS mv_total
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,
    "q_mv_agg" ->
      """SELECT label, count(*) AS n_elems,
        |  round(sum(CAST(e AS DOUBLE)), 4) AS sum_e,
        |  round(min(CAST(e AS DOUBLE)), 4) AS min_e,
        |  round(max(CAST(e AS DOUBLE)), 4) AS max_e,
        |  round(avg(CAST(e AS DOUBLE)), 4) AS avg_e
        |FROM (SELECT label, unnest(embedding) AS e FROM embeddings)
        |GROUP BY label ORDER BY label""".stripMargin,
    "q_mv_valuein" ->
      """SELECT lang, word, count(*) AS cnt FROM (
        |  SELECT lang, unnest(list_filter(string_split(text, ' '),
        |    w -> w IN ('scan','join','filter','the'))) AS word
        |  FROM documents)
        |GROUP BY lang, word ORDER BY lang, word""".stripMargin,
    "q_text_stats" ->
      """SELECT lang, source, count(*) AS cnt,
        |  round(avg(n_chars), 3) AS avg_chars,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "q_token_stats" ->
      s"""SELECT doc_id,
         |  len($toksSql) AS n_tokens,
         |  len(list_distinct($toksSql)) AS n_distinct,
         |  CAST(COALESCE(list_aggregate(list_transform($toksSql,
         |      w -> CAST(ceil(len(w) / 4.0) AS BIGINT)), 'sum'), 0)
         |    + length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS BIGINT)
         |    AS bpe_est
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_lang_id" -> {
      val ratios = TextAnalysis.stopwordProfiles.map { case (lang, prof) =>
        if (TextAnalysis.charProfileLangs(lang)) {
          // char-substring occurrence ratio (languages without spaces)
          val hits = prof.map(c =>
            s"(length(text) - length(replace(text, '$c', ''))) / ${c.length}.0")
            .mkString(" + ")
          s"""CASE WHEN length(text) > 0 THEN CAST($hits AS DOUBLE) / CAST(length(text) AS DOUBLE) ELSE 0.0 END AS r_$lang"""
        } else {
          val set = prof.map(w => s"'$w'").mkString("(", ",", ")")
          s"""CASE WHEN len(toks) > 0 THEN CAST(len(list_filter(toks, x -> x IN $set)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS r_$lang"""
        }
      }.mkString(",\n    ")
      val best = langProfilesSql.map(p => s"r_${p._1}").mkString("greatest(", ", ", ")")
      val caseChain = langProfilesSql.map { case (lang, _) =>
        s"WHEN r_$lang > 0 AND r_$lang = $best THEN '$lang'"
      }.mkString("CASE ", " ", " ELSE 'und' END")
      s"""SELECT lang, lang_pred, count(*) AS cnt FROM (
         |  SELECT lang, $caseChain AS lang_pred FROM (
         |    SELECT lang, $ratios
         |    FROM (SELECT lang, text, $toksSql AS toks FROM documents)))
         |GROUP BY lang, lang_pred ORDER BY lang, lang_pred""".stripMargin
    },
    "q_quality" -> {
      val enSet = langProfilesSql.head._2
      s"""WITH m AS (
         |  SELECT source,
         |    CAST(length(text) AS DOUBLE) AS n_chars,
         |    CAST(len(toks) AS DOUBLE) AS n_tokens,
         |    round(CASE WHEN len(toks) > 0 THEN
         |      list_aggregate(list_transform(toks, w -> CAST(len(w) AS DOUBLE)), 'sum')
         |        / CAST(len(toks) AS DOUBLE) ELSE 0.0 END, 4) AS mtl,
         |    round(CASE WHEN len(toks) > 0 THEN
         |      CAST(len(list_filter(toks, x -> x IN $enSet)) AS DOUBLE)
         |        / CAST(len(toks) AS DOUBLE) ELSE 0.0 END, 4) AS sw,
         |    round(CASE WHEN length(text) > 0 THEN
         |      CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
         |        / CAST(length(text) AS DOUBLE) ELSE 0.0 END, 4) AS pr,
         |    round(CASE WHEN length(text) > 0 THEN
         |      CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
         |        / CAST(length(text) AS DOUBLE) ELSE 0.0 END, 4) AS dr
         |  FROM (SELECT source, text, $toksSql AS toks FROM documents))
         |SELECT source, count(*) AS cnt,
         |  round(avg(round(
         |    least(n_tokens / 20.0, 1.0) * 0.4
         |    + (CASE WHEN mtl BETWEEN 2.5 AND 9.0 THEN 1.0 ELSE 0.3 END) * 0.3
         |    + (CASE WHEN pr < 0.2 THEN 1.0 ELSE 0.2 END) * 0.15
         |    + (CASE WHEN dr < 0.3 THEN 1.0 ELSE 0.2 END) * 0.15, 4)), 3) AS avg_score,
         |  round(avg(sw), 3) AS avg_stopword
         |FROM m GROUP BY source ORDER BY source""".stripMargin
    },
    "q_lang_quality" -> {
      // the fused kernel's twin: per-document lang_pred (the q_lang_id
      // CASE chain) and quality score (the q_quality arithmetic) from
      // ONE scan, then the rollup — componentwise the same formulas
      val ratios = TextAnalysis.stopwordProfiles.map { case (lang, prof) =>
        if (TextAnalysis.charProfileLangs(lang)) {
          val hits = prof.map(c =>
            s"(length(text) - length(replace(text, '$c', ''))) / ${c.length}.0")
            .mkString(" + ")
          s"""CASE WHEN length(text) > 0 THEN CAST($hits AS DOUBLE) / CAST(length(text) AS DOUBLE) ELSE 0.0 END AS r_$lang"""
        } else {
          val set = prof.map(w => s"'$w'").mkString("(", ",", ")")
          s"""CASE WHEN len(toks) > 0 THEN CAST(len(list_filter(toks, x -> x IN $set)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS r_$lang"""
        }
      }.mkString(",\n    ")
      val best = langProfilesSql.map(p => s"r_${p._1}").mkString("greatest(", ", ", ")")
      val caseChain = langProfilesSql.map { case (lang, _) =>
        s"WHEN r_$lang > 0 AND r_$lang = $best THEN '$lang'"
      }.mkString("CASE ", " ", " ELSE 'und' END")
      s"""WITH r AS (
         |  SELECT text, toks, $ratios
         |  FROM (SELECT text, $toksSql AS toks FROM documents)),
         |m AS (
         |  SELECT $caseChain AS lang_pred,
         |    CAST(len(toks) AS DOUBLE) AS n_tokens,
         |    round(CASE WHEN len(toks) > 0 THEN
         |      list_aggregate(list_transform(toks, w -> CAST(len(w) AS DOUBLE)), 'sum')
         |        / CAST(len(toks) AS DOUBLE) ELSE 0.0 END, 4) AS mtl,
         |    round(CASE WHEN length(text) > 0 THEN
         |      CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
         |        / CAST(length(text) AS DOUBLE) ELSE 0.0 END, 4) AS pr,
         |    round(CASE WHEN length(text) > 0 THEN
         |      CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
         |        / CAST(length(text) AS DOUBLE) ELSE 0.0 END, 4) AS dr
         |  FROM r)
         |SELECT lang_pred, count(*) AS cnt,
         |  round(avg(round(
         |    least(n_tokens / 20.0, 1.0) * 0.4
         |    + (CASE WHEN mtl BETWEEN 2.5 AND 9.0 THEN 1.0 ELSE 0.3 END) * 0.3
         |    + (CASE WHEN pr < 0.2 THEN 1.0 ELSE 0.2 END) * 0.15
         |    + (CASE WHEN dr < 0.3 THEN 1.0 ELSE 0.2 END) * 0.15, 4)), 3) AS avg_q
         |FROM m GROUP BY lang_pred ORDER BY lang_pred""".stripMargin
    },
    "q_fingerprint" ->
      s"""SELECT lang, count(*) AS cnt,
         |  count(DISTINCT md5($normSql)) AS distinct_fp,
         |  min(md5($normSql)) AS min_fp
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_dedup_exact" ->
      s"""SELECT lang, count(*) AS cnt FROM (
         |  SELECT lang, row_number() OVER (PARTITION BY $normSql ORDER BY doc_id) AS rn
         |  FROM documents) WHERE rn = 1
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_dedup_ids" ->
      s"""SELECT count(*) AS n_survivors,
         |  CAST(sum(doc_id) AS BIGINT) AS sum_id,
         |  min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM (SELECT min(doc_id) AS doc_id FROM documents GROUP BY $normSql)""".stripMargin,
    "q_json_extract" ->
      """SELECT CAST(floor(CAST(json_extract_string(props, '$.k') AS INT) / 10.0) AS BIGINT) AS k_bucket,
        |  count(*) AS cnt, round(sum("value"), 3) AS sum_value
        |FROM events GROUP BY k_bucket ORDER BY k_bucket""".stripMargin,
    "q_knn_brute" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, round(${cosSql("e.embedding", "q.qv")}, 6) AS sim
         |FROM embeddings e, q
         |ORDER BY sim DESC, e.vec_id LIMIT 10""".stripMargin,
    // identical statement: the packed layout must reproduce the array
    // kernel's answers bit-for-bit (same float→double widening)
    "q_knn_packed" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, round(${cosSql("e.embedding", "q.qv")}, 6) AS sim
         |FROM embeddings e, q
         |ORDER BY sim DESC, e.vec_id LIMIT 10""".stripMargin,
    "q_mv_range_dc" ->
      """SELECT label,
        |  round(max(CAST(e AS DOUBLE)) - min(CAST(e AS DOUBLE)), 4) AS range_e,
        |  count(DISTINCT e) AS dc_e
        |FROM (SELECT label, unnest(embedding) AS e FROM embeddings)
        |GROUP BY label ORDER BY label""".stripMargin,
    "q_mv_percentile" ->
      """SELECT label,
        |  round(quantile_cont(CAST(e AS DOUBLE), 0.5), 4) AS p50_e,
        |  round(quantile_cont(CAST(e AS DOUBLE), 0.9), 4) AS p90_e,
        |  TRUE AS p50_ok, TRUE AS p90_ok
        |FROM (SELECT label, unnest(embedding) AS e FROM embeddings)
        |GROUP BY label ORDER BY label""".stripMargin,
    "q_media_features" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  TRUE AS dims_ok, TRUE AS range_ok, TRUE AS frames_ok
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    "q_media_meta" ->
      """SELECT doc_id, 'png' AS format,
        |  CAST(1 + doc_id % 64 AS INT) AS width,
        |  CAST(1 + (doc_id * 7) % 48 AS INT) AS height
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    "q_audio_meta" ->
      """SELECT doc_id, 'wav' AS format,
        |  CAST(8000 + (doc_id % 5) * 4000 AS INT) AS sample_rate,
        |  CAST(1 AS INT) AS channels, CAST(16 AS INT) AS bits,
        |  CAST((1000 * (1000 + (doc_id * 13) % 3000))
        |       // (8000 + (doc_id % 5) * 4000) AS BIGINT) AS duration_ms
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    "q_video_meta" ->
      """SELECT doc_id, 'mp4' AS format,
        |  CAST(16 + (doc_id % 240) * 8 AS INT) AS width,
        |  CAST(16 + ((doc_id * 3) % 120) * 9 AS INT) AS height,
        |  CAST(1000 + (doc_id * 77) % 9000 AS BIGINT) AS duration_ms
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    // Self-oracles: Spark proves hash-dependent invariants (booleans);
    // DuckDB reproduces the deterministic row universe and expects
    // uniform TRUE. A single violated invariant breaks the hash match.
    "q_lsh_ann" ->
      """SELECT vec_id AS query_id, TRUE AS recall_ok, TRUE AS k_ok
        |FROM embeddings WHERE vec_id < 20 ORDER BY query_id""".stripMargin,
    "q_ivf_ann" ->
      """SELECT vec_id AS query_id, CAST(3 AS BIGINT) AS n_exact, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 20 ORDER BY query_id""".stripMargin,
    "q_minhash_pairs" ->
      s"""SELECT doc_id, TRUE AS est_ok, TRUE AS found_ok
         |FROM documents WHERE doc_id < 200 AND len($toksSql) >= 30
         |ORDER BY doc_id""".stripMargin,
    "q_simhash" ->
      s"""SELECT doc_id, TRUE AS self_ok, TRUE AS near_ok, TRUE AS range_ok
         |FROM documents WHERE doc_id < 200 AND len($toksSql) >= 30
         |ORDER BY doc_id""".stripMargin,
    "q_near_dup" ->
      s"""SELECT doc_id, TRUE AS found_ok, TRUE AS jac_ok
         |FROM documents WHERE doc_id < 200 AND len($toksSql) >= 30
         |ORDER BY doc_id""".stripMargin,
    "q_embed_neardup" ->
      """SELECT vec_id, TRUE AS found_ok FROM embeddings
        |WHERE vec_id < 100 ORDER BY vec_id""".stripMargin,
    // Exact top-20 token counts; the CMS bound booleans are
    // deterministic invariants (fixed seed + fixed dataset).
    "q_heavy_hitters" ->
      s"""SELECT tok, count(*) AS cnt,
         |  TRUE AS no_underestimate, TRUE AS bound_ok
         |FROM (SELECT unnest($toksSql) AS tok FROM documents)
         |GROUP BY tok ORDER BY cnt DESC, tok LIMIT 20""".stripMargin,
    // Exact row-set oracle for the deterministic sampler: DuckDB
    // computes the identical md5-based membership predicate.
    "q_hash_sample" ->
      """SELECT lang, count(*) AS cnt, min(doc_id) AS min_id,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE CAST(('0x' || SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      / 4294967296.0 < 0.1
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // Exact ground truth for the standalone Jaccard similarity join:
    // DuckDB computes ALL-PAIRS bigram Jaccard over the universe (it
    // can afford O(n²) at oracle scale; the Spark side must reach the
    // same pairs through prefix filtering).
    "q_jaccard_join" -> {
      val normToks =
        """list_filter(string_split_regex(regexp_replace(lower(trim(text)),
          |      '\s+', ' ', 'g'), '\s+'), x -> len(x) > 0)""".stripMargin
      s"""WITH toks AS (
         |  SELECT doc_id, $normToks AS t
         |  FROM documents WHERE doc_id < 200
         |), sh AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS s
         |  FROM toks WHERE len(t) >= 30
         |)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |    / len(list_distinct(a.s || b.s)), 4) AS jaccard
         |FROM sh a, sh b
         |WHERE a.doc_id < b.doc_id
         |  AND round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |    / len(list_distinct(a.s || b.s)), 4) >= 0.7
         |ORDER BY id_a, id_b""".stripMargin
    },
    // Exact ground truth for the whole near-dup dedup pipeline:
    // bigram Jaccard over normalized tokens, transitive clustering by
    // recursive CTE, survivors = component minima.
    "q_dedup_cluster" -> {
      val normToks =
        """list_filter(string_split_regex(regexp_replace(lower(trim(text)),
          |      '\s+', ' ', 'g'), '\s+'), x -> len(x) > 0)""".stripMargin
      s"""WITH RECURSIVE toks AS (
         |  SELECT doc_id, $normToks AS t
         |  FROM documents WHERE doc_id < 200
         |), sh AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS s
         |  FROM toks WHERE len(t) >= 30
         |), pairs AS (
         |  SELECT a.doc_id AS src, b.doc_id AS dst
         |  FROM sh a, sh b
         |  WHERE a.doc_id <> b.doc_id
         |    AND round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |          / len(list_distinct(a.s || b.s)), 4) >= 0.7
         |), reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM sh
         |  UNION
         |  SELECT p.src, reach.r FROM pairs p JOIN reach ON p.dst = reach.id
         |)
         |SELECT id AS doc_id FROM reach GROUP BY id HAVING id = min(r)
         |ORDER BY doc_id""".stripMargin
    },
    "q_winnow" ->
      s"""SELECT doc_id, TRUE AS self_ok, TRUE AS near_ok, TRUE AS size_ok
         |FROM documents WHERE doc_id < 200 AND len($toksSql) >= 30
         |ORDER BY doc_id""".stripMargin,
    "q_repetition" ->
      s"""WITH base AS (
         |  SELECT doc_id, trim(text) AS t,
         |    array_to_string(($toksSql)[3:], ' ') AS pert
         |  FROM documents WHERE doc_id < 200 AND len($toksSql) >= 30),
         |units AS (
         |  SELECT doc_id, t AS unit FROM base
         |  UNION ALL SELECT doc_id, pert FROM base
         |  UNION ALL SELECT doc_id, t FROM base),
         |g AS (
         |  SELECT doc_id, unit, count(*) AS c, len(unit) AS len_u
         |  FROM units GROUP BY 1, 2)
         |SELECT doc_id, CAST(sum(c) AS INT) AS n_units,
         |  round(sum(c - 1) / sum(c), 4) AS dup_unit_frac,
         |  round(sum((c - 1) * len_u) / sum(c * len_u), 4) AS dup_unit_char_frac,
         |  TRUE AS top2_ok, TRUE AS dup5_ok
         |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_knn_join" ->
      s"""SELECT query_id, corpus_id, sim, rk FROM (
         |  SELECT q.vec_id AS query_id, e.vec_id AS corpus_id,
         |    round(${cosSql("q.embedding", "e.embedding")}, 6) AS sim,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY round(${cosSql("q.embedding", "e.embedding")}, 6) DESC, e.vec_id) AS rk
         |  FROM embeddings q, embeddings e
         |  WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id)
         |WHERE rk <= 3 ORDER BY query_id, rk""".stripMargin)
}
