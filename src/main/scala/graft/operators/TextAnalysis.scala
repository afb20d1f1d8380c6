package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, fingerprinting.
  *
  * Everything here is a pure `Column` composition over
  * `org.apache.spark.sql.functions` — no Scala UDFs — so the whole
  * pipeline stays inside Catalyst: it codegens, it pushes through
  * shuffles, and at 100 TB it is embarrassingly parallel per row with
  * zero driver participation. (The reference has no text operators;
  * these extend the engine per the project brief, as ingest-time
  * transforms in the spirit of Pinot's record-transformer chain,
  * `pinot-core/.../data/recordtransformer/`.)
  */
object TextAnalysis {

  /** Whitespace tokenization with empty-token removal. */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /** Token count (whitespace tokens) — codegen byte-scan kernel
    * ([[graft.functions.HashOps.tokenCount]]); the declarative twin
    * below states the semantics and pins parity. */
  def tokenCount(text: Column): Column =
    graft.functions.GraftFunctions.tokenCount(text)

  /** Declarative token count — semantics reference for the kernel
    * (regex split materializes a per-row token array; measured 5-6×
    * the kernel's cost at 10^8 docs). */
  def tokenCountDeclarative(text: Column): Column = size(tokens(text))

  /** BPE-ish token estimate: word-piece heuristic — alnum runs split
    * into ≤4-char pieces plus one token per punctuation char. A cheap
    * deterministic stand-in for a real BPE vocab (which would ship as
    * a broadcast dictionary at scale). */
  def bpeTokenEstimate(text: Column): Column = {
    val words = tokens(text)
    val wordPieces = aggregate(
      transform(words, w => ceil(length(w).cast("double") / lit(4.0)).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val punct = length(regexp_replace(text, "[A-Za-z0-9\\s]", ""))
    wordPieces + punct.cast("long")
  }

  /** Per-language stopword profiles for the n-gram/stopword language
    * heuristic (single source of truth in
    * [[graft.functions.HashOps.stopwordProfiles]], shared with the
    * codegen'd kernels). */
  val stopwordProfiles: Seq[(String, Seq[String])] =
    graft.functions.HashOps.stopwordProfiles

  /** Stopword-hit ratio for one language profile: |tokens ∩ profile| /
    * |tokens| (multiset numerator — repeated stopwords count). */
  def stopwordRatio(text: Column, profile: Seq[String]): Column = {
    val toks = tokens(text)
    val hits = size(filter(toks, t => t.isin(profile.map(x => x: Any): _*)))
    when(size(toks) > 0, hits.cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Languages whose profile is scored by character-substring counts
    * rather than whitespace tokens (scripts written without spaces —
    * a whitespace token of Chinese text is a whole sentence and would
    * never equal a single-character stopword). */
  val charProfileLangs: Set[String] = Set("zh")

  /** Occurrence-count ratio of profile characters as substrings:
    * Σ occurrences(c) / n_chars. The scoring path for
    * [[charProfileLangs]]. */
  def charProfileRatio(text: Column, profile: Seq[String]): Column = {
    val nChars = length(text).cast("double")
    val hits = profile
      .map(c => (length(text) - length(replace(text, lit(c), lit("")))).cast("double")
        / lit(c.length.toDouble))
      .reduce(_ + _)
    when(nChars > 0, hits / nChars).otherwise(lit(0.0))
  }

  /** Per-profile language score: token stopword-hit ratio for
    * space-delimited languages, character-occurrence ratio for
    * [[charProfileLangs]]. */
  def langScore(text: Column, lang: String, profile: Seq[String]): Column =
    if (charProfileLangs(lang)) charProfileRatio(text, profile)
    else stopwordRatio(text, profile)

  /** Language ID: argmax over per-language profile scores, ties broken
    * by profile order, "und" (undetermined) when no profile scores > 0.
    * Runs as the single-pass codegen'd kernel
    * ([[graft.functions.HashOps.langId]]); [[langIdDeclarative]] is the
    * SQL-expressible twin the DuckDB oracle mirrors, and kernel↔Column
    * parity is asserted in TextKernelParitySpec. */
  def langId(text: Column): Column = graft.functions.GraftFunctions.langId(text)

  /** Fused `struct(lang, quality)` in ONE text pass — componentwise
    * equal to `(langId(text), qualityScore(text))`, which each pay
    * their own tokenization ([[graft.functions.HashOps.langQuality]]).
    * The language-filter + quality-threshold stage every pretraining
    * pipeline runs evaluates both per document, so the fusion halves
    * its dominant per-row cost. */
  def langQuality(text: Column): Column =
    graft.functions.GraftFunctions.langQuality(text)

  /** Declarative formulation of [[langId]] (per-profile when-chains
    * over interpreted higher-order functions — ~10× slower, kept as
    * the parity/oracle reference). */
  def langIdDeclarative(text: Column): Column = {
    val scores = stopwordProfiles.map { case (lang, prof) =>
      lang -> langScore(text, lang, prof)
    }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, score), elseCol) =>
      when(score > 0 && score === best, lit(lang)).otherwise(elseCol)
    }
  }

  /** Quality metrics struct: char/token counts, mean token length,
    * stopword ratio (en), punctuation and digit ratios — the standard
    * cheap filters a pretraining pipeline runs before dedup. Single
    * tokenization + char sweep per row in the codegen'd kernel
    * ([[graft.functions.HashOps.textStats]]); the declarative twin
    * below re-tokenized once per metric. */
  def qualityMetrics(text: Column): Column = graft.functions.GraftFunctions.textStats(text)

  /** Declarative formulation of [[qualityMetrics]] (parity/oracle
    * reference). */
  def qualityMetricsDeclarative(text: Column): Column = {
    val toks = tokens(text)
    val nChars = length(text).cast("double")
    val nToks = size(toks).cast("double")
    struct(
      length(text).as("n_chars"),
      size(toks).as("n_tokens"),
      round(when(nToks > 0,
        aggregate(transform(toks, t => length(t).cast("double")), lit(0.0), _ + _) / nToks)
        .otherwise(0.0), 4).as("mean_token_len"),
      round(stopwordRatio(text, stopwordProfiles.head._2), 4).as("stopword_ratio"),
      round(when(nChars > 0,
        length(regexp_replace(text, "[^.,;:!?]", "")).cast("double") / nChars)
        .otherwise(0.0), 4).as("punct_ratio"),
      round(when(nChars > 0,
        length(regexp_replace(text, "[^0-9]", "")).cast("double") / nChars)
        .otherwise(0.0), 4).as("digit_ratio"))
  }

  /** Composite quality score in [0,1]: penalizes too-short docs,
    * degenerate token lengths, and punct/digit floods. Weights are
    * heuristic; the shape (bounded, monotone per feature) is what a
    * quality filter needs. Kernel-evaluated
    * ([[graft.functions.HashOps.qualityScore]]). */
  def qualityScore(text: Column): Column = graft.functions.GraftFunctions.qualityScore(text)

  /** Declarative formulation of [[qualityScore]] (parity/oracle
    * reference). */
  def qualityScoreDeclarative(text: Column): Column = {
    val m = qualityMetricsDeclarative(text)
    val lenScore = least(m.getField("n_tokens").cast("double") / lit(20.0), lit(1.0))
    val tokLen = m.getField("mean_token_len")
    val tokScore = when(tokLen.between(2.5, 9.0), 1.0).otherwise(0.3)
    val punctScore = when(m.getField("punct_ratio") < 0.2, 1.0).otherwise(0.2)
    val digitScore = when(m.getField("digit_ratio") < 0.3, 1.0).otherwise(0.2)
    round(lenScore * 0.4 + tokScore * 0.3 + punctScore * 0.15 + digitScore * 0.15, 4)
  }

  /** Repetition quality metrics (Rae et al. 2021 §A1.1 — the Gopher
    * repetition filters): duplicate unit (line/sentence) fractions by
    * count and by characters, most-frequent-bigram character coverage,
    * duplicated-5-gram character coverage. One codegen'd pass per
    * document ([[graft.functions.HashOps.repetitionStats]]); split
    * units on `delim` ("\n" for lines, "." for sentence-ish prose). */
  def repetitionStats(text: Column, delim: String = "\n"): Column =
    graft.functions.GraftFunctions.repetitionStats(text, delim)

  /** Whitespace/case-normalized form used by fingerprints and exact
    * dedup — Pinot's SanitationTransformer analog. Codegen byte-pass
    * kernel ([[graft.functions.HashOps.normalizeWs]]); the declarative
    * twin below states the semantics and pins parity. */
  def normalized(text: Column): Column =
    graft.functions.GraftFunctions.normalizeWs(text)

  /** Declarative normalizer — semantics reference for the kernel (the
    * per-row regex engine was a measured constant on every
    * fingerprint-keyed operator). */
  def normalizedDeclarative(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** 128-bit content fingerprint (hex md5 of the normalized text).
    * Portable across engines — DuckDB's md5 produces the identical
    * string, so fingerprints are oracle-checkable. */
  def fingerprintMd5(text: Column): Column = md5(normalized(text))

  /** [[fingerprintMd5]] as 16 RAW bytes via the fused normalize+digest
    * kernel ([[graft.functions.HashOps.md5Normalized]]): no
    * intermediate normalized string, half the shuffle key width of the
    * hex form — the internal dedup key (`hex(fingerprintMd5Bin) ==
    * fingerprintMd5`, so oracles stay portable). */
  def fingerprintMd5Bin(text: Column): Column =
    graft.functions.GraftFunctions.md5Normalized(text)

  /** 64-bit rolling fingerprint (xxhash64 of the normalized text) —
    * cheaper join key for dedup at scale (8 bytes vs 32-hex chars). */
  def fingerprint64(text: Column): Column = xxhash64(normalized(text))

  /** Winnowing rolling-hash fingerprint (MOSS-style): min-sampled
    * k-gram hash set of the normalized text → sorted array<bigint>.
    * Any shared substring of length ≥ k+w-1 contributes a shared
    * sample, so [[Dedup.winnowOverlap]] over two fingerprints
    * estimates shared content; ~len/w samples per doc keeps the
    * fingerprint compact at scale. Codegen'd kernel
    * ([[graft.functions.HashOps.winnow]]). */
  def winnowingFingerprint(text: Column, k: Int = 8, w: Int = 8): Column =
    graft.functions.GraftFunctions.winnowFingerprint(text, k, w)
}
