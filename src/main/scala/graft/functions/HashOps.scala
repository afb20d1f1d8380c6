package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernels for the custom Catalyst expressions in
  * [[graft.functions]]. Each method is a tight single-pass JVM loop
  * invoked from generated code (`defineCodeGen` emits a static call),
  * replacing interpreted higher-order-function pipelines that walked
  * each array once per hash function.
  *
  * Reference semantics (what, not how): Pinot evaluates block-oriented
  * transform functions over projected columns
  * (`pinot-core/.../operator/transform/function/TransformFunction.java:1-172`);
  * these kernels are the per-row equivalent, kept inside whole-stage
  * codegen so the 100 TB scan path never leaves Tungsten.
  *
  * Determinism: all hashing is seeded XXH64 — task retries and
  * speculative re-execution at cluster scale reproduce identical
  * results.
  */
object HashOps {
  final val Seed1 = 42L
  final val Seed2 = 0x9747b28cL

  @inline private def hashStr(s: UTF8String, seed: Long): Long =
    XXH64.hashUTF8String(s, seed)

  /** Java-regex `\s` (ASCII-only — the class the Column path's
    * `split(text, "\\s+")` matches; `Character.isWhitespace` would also
    * split on U+3000 etc. and diverge). */
  @inline private def isAsciiSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Lowercased whitespace tokens — exact kernel equivalent of
    * `TextAnalysis.tokens(TextAnalysis.normalized(text))`: lowercase via
    * `UTF8String.toLowerCase` (the same call Spark's `lower()` makes,
    * so non-ASCII case mapping is identical), split on the ASCII `\s`
    * class only. Parity is asserted in TokenizeParitySpec. */
  def tokenize(text: UTF8String): Array[String] = {
    val s = text.toLowerCase.toString
    val out = mutable.ArrayBuilder.make[String]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isAsciiSpace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isAsciiSpace(s.charAt(i))) i += 1
      if (i > start) out += s.substring(start, i)
    }
    out.result()
  }

  /** Distinct word n-gram shingles joined by single spaces. Texts with
    * fewer than n tokens produce one shingle of all tokens (so every
    * doc has a non-empty shingle set). */
  def shingleSet(tokens: Array[String], n: Int): java.util.HashSet[String] = {
    val set = new java.util.HashSet[String]()
    if (tokens.length < n) {
      set.add(tokens.mkString(" "))
    } else {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + n <= tokens.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(tokens(i + j))
          j += 1
        }
        set.add(sb.toString)
        i += 1
      }
    }
    set
  }

  /** Distinct n-gram shingle set as a SORTED array<string> — one
    * tokenize + one shingle pass per document (the HOF formulation
    * `transform(sequence, i -> concat_ws(slice(...)))` was measured at
    * ~36 µs per shingle interpreted; this kernel is ~100× cheaper and
    * keeps the projection inside whole-stage codegen). Sorted for
    * deterministic output under task retries. */
  def shingleArray(text: UTF8String, n: Int): ArrayData = {
    val set = shingleSet(tokenize(text), n)
    val arr = new Array[AnyRef](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    java.util.Arrays.sort(arr, null)
    new GenericArrayData(arr)
  }

  /** Distinct n-gram shingle set as a SORTED array<bigint> of seeded
    * XXH64 shingle hashes — the VERIFY-STAGE representation of a
    * document's shingle set. Jaccard needs only element EQUALITY, so
    * 8-byte hashes carry the same information as the strings at a
    * fraction of the bytes: at 10^8 docs the near-dup verify stage
    * caches and twice shuffles the candidate docs' shingle sets, and
    * word-shingle strings average ~20-40 B vs 8 B here — a 3-5×
    * reduction of the stage's dominant byte volume, plus long-compare
    * merges instead of memcmp. A hash collision merges two shingles
    * (Jaccard moves by ~1/|set| with probability ~|set|²/2^64 per
    * doc — never at realistic scale); the planted-pair recall oracle
    * and the string-kernel parity spec keep this honest. */
  def shingleHashArray(text: UTF8String, n: Int): ArrayData = {
    val set = shingleSet(tokenize(text), n)
    val arr = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) {
      arr(i) = hashStr(UTF8String.fromString(it.next()), Seed1)
      i += 1
    }
    java.util.Arrays.sort(arr)
    // dedupe post-sort: distinct strings can (theoretically) collide
    // to one hash; the array contract is SORTED DISTINCT
    var w = 0
    i = 0
    while (i < arr.length) {
      if (w == 0 || arr(w - 1) != arr(i)) { arr(w) = arr(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == arr.length) arr else java.util.Arrays.copyOf(arr, w))
  }

  /** Exact Jaccard of two SORTED DISTINCT long arrays (the
    * [[shingleHashArray]] output shape) — the long-typed twin of
    * [[sortedJaccard]], same merge-count core and the same 4-decimal
    * HALF_UP rounding. */
  def sortedJaccardHash(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union <= 0) 0.0
    else java.math.BigDecimal.valueOf(inter.toDouble / union)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** Exact n-gram Jaccard of two texts in one kernel call: both
    * shingle sets built JVM-side, hash-set intersection counted,
    * |A∩B| / |A∪B| rounded to 4 places with Spark `round`'s exact
    * semantics (BigDecimal.valueOf + HALF_UP) so results are
    * bit-identical to the previous Column formulation. */
  def ngramJaccard(a: UTF8String, b: UTF8String, n: Int): Double = {
    val sa = shingleSet(tokenize(a), n)
    val sb = shingleSet(tokenize(b), n)
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    val union = sa.size + sb.size - inter
    if (union <= 0) 0.0
    else java.math.BigDecimal.valueOf(inter.toDouble / union)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** Exact Jaccard of two SORTED DISTINCT string arrays (the
    * [[shingleArray]] output shape) by merge-counting the
    * intersection — no per-pair hash-set or output-array allocation
    * (`array_intersect` + `array_union` pay both), which is the
    * difference between ~8 µs and sub-µs per candidate pair in the
    * similarity-join verify stage. Same rounding as [[ngramJaccard]]. */
  def sortedJaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    var nullsA = 0
    var nullsB = 0
    while (i < na && j < nb) {
      val x = a.getUTF8String(i)
      val y = b.getUTF8String(j)
      // null elements (possible via hand-built SQL arrays; never from
      // the shingle kernel) are skipped and excluded from the union
      if (x == null) { nullsA += 1; i += 1 }
      else if (y == null) { nullsB += 1; j += 1 }
      else {
        val c = x.compareTo(y)
        if (c == 0) { inter += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    while (i < na) { if (a.getUTF8String(i) == null) nullsA += 1; i += 1 }
    while (j < nb) { if (b.getUTF8String(j) == null) nullsB += 1; j += 1 }
    val union = (na - nullsA) + (nb - nullsB) - inter
    if (union <= 0) 0.0
    else java.math.BigDecimal.valueOf(inter.toDouble / union)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** MinHash signature in ONE pass over the shingle set: per shingle
    * two base hashes (h1, h2), the i-th hash function is h1 + i*h2
    * (standard double hashing), accumulated into running minima.
    * O(shingles · (len + numHashes)) vs the HOF formulation's
    * O(shingles · numHashes) full-array rebuilds. */
  def minhashSig(text: UTF8String, numHashes: Int, shingleSize: Int): ArrayData = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val it = shingleSet(tokenize(text), shingleSize).iterator()
    while (it.hasNext) {
      val u = UTF8String.fromString(it.next())
      val h1 = hashStr(u, Seed1)
      val h2 = hashStr(u, Seed2) | 1L
      var g = h1
      var i = 0
      while (i < numHashes) {
        if (g < sig(i)) sig(i) = g
        g += h2
        i += 1
      }
    }
    new GenericArrayData(sig)
  }

  /** SimHash-64 over the token multiset: per token one hash, its bits
    * vote ±1 into 64 counters; positive counters set the output bit. */
  def simhash64(text: UTF8String): Long = {
    val counters = new Array[Int](64)
    val toks = tokenize(text)
    var t = 0
    while (t < toks.length) {
      val h = hashStr(UTF8String.fromString(toks(t)), Seed1)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counters(i) += 1 else counters(i) -= 1
        i += 1
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (counters(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  /** Whitespace-byte test for the UTF-8 byte scan: Java-regex `\s` =
    * `[ \t\n\x0B\f\r]`, all single ASCII bytes, so a byte-level scan is
    * exact — UTF-8 continuation bytes are ≥ 0x80 (negative as `Byte`)
    * and never match. */
  @inline private def isWsByte(b: Byte): Boolean =
    b == 0x20 || (b >= 9 && b <= 13)

  /** Token count as a pure byte scan: number of maximal runs of
    * non-`\s` bytes. Exact kernel twin of the Column formulation
    * `size(filter(split(trim(text), "\\s+"), t => length(t) > 0))`
    * (parity pinned in TextKernelParitySpec) with no regex engine, no
    * per-token String and no array materialization — at 10^8 docs the
    * declarative form's per-row `String[]` was the dominant cost of
    * the token-stats pipeline stage. */
  def tokenCount(text: UTF8String): Int = {
    val n = text.numBytes()
    var count = 0
    var inTok = false
    var i = 0
    while (i < n) {
      if (isWsByte(text.getByte(i))) inTok = false
      else if (!inTok) { count += 1; inTok = true }
      i += 1
    }
    count
  }

  /** Whitespace/case normalization as a single byte pass — exact
    * kernel twin of `regexp_replace(lower(trim(text)), "\\s+", " ")`
    * (the fingerprint/dedup normalizer): trim ASCII spaces at the ends
    * (Spark `trim` semantics — spaces only, not tabs), lowercase, then
    * collapse every `\s+` run to one space. ASCII-only inputs (the
    * overwhelming case for the fast path to earn its keep) run the
    * zero-copy byte loop; any non-ASCII byte falls back to the exact
    * `UTF8String.trim().toLowerCase` + Java-regex composition the
    * Column path executes, so parity holds for all inputs
    * (TextKernelParitySpec fuzzes both paths). */
  def normalizeWs(text: UTF8String): UTF8String = {
    val n = text.numBytes()
    var i = 0
    while (i < n) {
      if (text.getByte(i) < 0)
        return UTF8String.fromString(
          text.trim().toLowerCase.toString.replaceAll("\\s+", " "))
      i += 1
    }
    var start = 0
    var end = n
    while (start < end && text.getByte(start) == 0x20) start += 1
    while (end > start && text.getByte(end - 1) == 0x20) end -= 1
    val out = new Array[Byte](end - start)
    var o = 0
    var inWs = false
    i = start
    while (i < end) {
      val b = text.getByte(i)
      if (isWsByte(b)) {
        if (!inWs) { out(o) = 0x20; o += 1 }
        inWs = true
      } else {
        inWs = false
        out(o) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
        o += 1
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }

  private val md5Tl: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
  private val normBufTl: ThreadLocal[Array[Byte]] =
    new ThreadLocal[Array[Byte]] {
      override def initialValue(): Array[Byte] = new Array[Byte](8192)
    }
  /** Largest normalization buffer RETAINED per thread (256 KB): one
    * multi-MB outlier document must not pin megabytes on every executor
    * thread for the session lifetime — past the cap the row pays a
    * one-off allocation instead. */
  private final val NormBufRetainMax = 1 << 18

  /** The [[graft.functions.exprs.DictDecode]] out-of-bounds failure —
    * called from generated code, so it lives on a stable JVM path. */
  def dictDecodeOob(id: Int, size: Int): UTF8String =
    throw new IllegalStateException(
      s"dict_decode: id $id outside dictionary of size $size — " +
        "stale encoded segment or dictionary/segment version mismatch?")

  /** Fused `md5(normalizeWs(text))` as 16 raw bytes — the exact-dedup
    * fingerprint without materializing the normalized string: the
    * ASCII path streams the trim/collapse/lowercase bytes through a
    * thread-local reusable buffer straight into a thread-local MD5
    * digest (zero per-row allocation beyond the 16-byte result), where
    * the composed form allocated the normalized copy, re-copied it for
    * the digest, and produced a 32-byte HEX string — which then rode
    * the dedup shuffle at twice the key width. Bit parity with
    * `unhex(md5(normalize_ws(text)))` is pinned in
    * TextKernelParitySpec; a non-ASCII byte falls back to digesting
    * [[normalizeWs]]'s output, so parity holds for all inputs. */
  def md5Normalized(text: UTF8String): Array[Byte] = {
    val md = md5Tl.get()
    if (firstNonAscii(text) >= 0) {
      md.update(normalizeWs(text).getBytes)
      return md.digest()
    }
    val n = text.numBytes()
    var buf = normBufTl.get()
    if (buf.length < n) {
      // next power of two, guarded against the n > 2^30 overflow where
      // highestOneBit << 1 wraps negative; buffers past the retain cap
      // are transient (rare outlier rows allocate, common rows reuse)
      val size =
        if (n >= (1 << 30)) n
        else java.lang.Integer.highestOneBit(math.max(n, 1)) << 1
      buf = new Array[Byte](size)
      if (size <= NormBufRetainMax) normBufTl.set(buf)
    }
    var start = 0
    var end = n
    while (start < end && text.getByte(start) == 0x20) start += 1
    while (end > start && text.getByte(end - 1) == 0x20) end -= 1
    var o = 0
    var inWs = false
    var i = start
    while (i < end) {
      val b = text.getByte(i)
      if (isWsByte(b)) {
        if (!inWs) { buf(o) = 0x20; o += 1 }
        inWs = true
      } else {
        inWs = false
        buf(o) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
        o += 1
      }
      i += 1
    }
    md.update(buf, 0, o)
    md.digest()
  }

  /** Case-PRESERVING ASCII-\s tokens — kernel equivalent of the raw
    * `TextAnalysis.tokens(text)` Column path (which does NOT
    * lowercase; [[tokenize]] is the lowercased normalized variant). */
  def tokenizeRaw(text: UTF8String): Array[String] = {
    val s = text.toString
    val out = mutable.ArrayBuilder.make[String]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isAsciiSpace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isAsciiSpace(s.charAt(i))) i += 1
      if (i > start) out += s.substring(start, i)
    }
    out.result()
  }

  /** Language profiles for the stopword/char heuristics — the single
    * source of truth ([[graft.operators.TextAnalysis]] re-exports). */
  final val stopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "den", "nicht", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "de", "que", "por"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不", "这", "个"))

  /** Languages scored by char-substring occurrence instead of tokens. */
  final val charProfileLangs: Set[String] = Set("zh")

  private val profileSets: Array[(String, java.util.HashSet[String])] =
    stopwordProfiles.filterNot(p => charProfileLangs(p._1)).map { case (lang, words) =>
      val set = new java.util.HashSet[String]()
      words.foreach(set.add)
      lang -> set
    }.toArray
  private val charProfiles: Array[(String, Array[String])] =
    stopwordProfiles.filter(p => charProfileLangs(p._1))
      .map { case (l, cs) => l -> cs.toArray }.toArray
  private val enSet: java.util.HashSet[String] = profileSets.head._2

  /** Stopword profiles as raw ASCII byte arrays (all token-profile
    * words are ASCII), for the allocation-free byte-scan fast paths:
    * a token is matched as a byte RANGE of the input against each
    * word — no per-token String, no substring. */
  private val tokenProfileBytes: Array[(String, Array[Array[Byte]])] =
    stopwordProfiles.filterNot(p => charProfileLangs(p._1)).map { case (l, ws) =>
      l -> ws.map(_.getBytes(java.nio.charset.StandardCharsets.US_ASCII)).toArray
    }.toArray
  private val enWordBytes: Array[Array[Byte]] = tokenProfileBytes.head._2
  private val tokenProfileU8: Array[UTF8String] =
    tokenProfileBytes.map(p => UTF8String.fromString(p._1))
  private val undU8: UTF8String = UTF8String.fromString("und")

  /** text[start, end) == word (byte-wise)? */
  @inline private def rangeEquals(t: UTF8String, start: Int, end: Int,
      w: Array[Byte]): Boolean = {
    if (end - start != w.length) return false
    var i = 0
    while (i < w.length) {
      if (t.getByte(start + i) != w(i)) return false
      i += 1
    }
    true
  }

  /** First non-ASCII byte index, or -1 when pure ASCII — the fast-path
    * guard for [[textStats]]/[[langId]] (UTF-8 high bytes are negative
    * as `Byte`). */
  @inline private def firstNonAscii(t: UTF8String): Int = {
    val n = t.numBytes()
    var i = 0
    while (i < n) {
      if (t.getByte(i) < 0) return i
      i += 1
    }
    -1
  }

  /** round(x, 4) with Spark's Round semantics (HALF_UP decimal). */
  @inline private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  private def countOccurrences(s: String, sub: String): Int = {
    var count = 0
    var idx = s.indexOf(sub)
    while (idx >= 0) { count += 1; idx = s.indexOf(sub, idx + sub.length) }
    count
  }

  /** One-pass quality metrics — kernel twin of the declarative
    * `TextAnalysis` formulation (`length`, raw `\s+` tokens, en
    * stopword multiset ratio, `[.,;:!?]` / `[0-9]` char classes, all
    * ratios `round(_, 4)`); parity asserted in TextKernelParitySpec.
    * Returns (n_chars, n_tokens, mean_token_len, stopword_ratio,
    * punct_ratio, digit_ratio). The declarative tree re-tokenized the
    * text once per metric through interpreted higher-order functions —
    * this is one tokenization and one char sweep per row, inside
    * whole-stage codegen. */
  def textStats(text: UTF8String): InternalRow =
    if (firstNonAscii(text) < 0) textStatsAscii(text) else textStatsGeneric(text)

  /** All-ASCII fast path: one char-class byte sweep + one token byte
    * scan, zero allocation beyond the result row. nChars == numBytes
    * for ASCII, token byte ranges compare against the en stopword
    * bytes directly — identical arithmetic to [[textStatsGeneric]]
    * (the fuzzed parity spec covers both paths). */
  private def textStatsAscii(text: UTF8String): InternalRow = {
    val n = text.numBytes()
    var punct = 0
    var digits = 0
    var i = 0
    while (i < n) {
      val b = text.getByte(i)
      if (b == '.' || b == ',' || b == ';' || b == ':' || b == '!' || b == '?') punct += 1
      else if (b >= '0' && b <= '9') digits += 1
      i += 1
    }
    var nToks = 0
    var tokLenSum = 0.0
    var stopHits = 0
    i = 0
    while (i < n) {
      while (i < n && isWsByte(text.getByte(i))) i += 1
      val start = i
      while (i < n && !isWsByte(text.getByte(i))) i += 1
      if (i > start) {
        nToks += 1
        tokLenSum += (i - start)
        var w = 0
        var found = false
        while (!found && w < enWordBytes.length) {
          if (rangeEquals(text, start, i, enWordBytes(w))) found = true
          w += 1
        }
        if (found) stopHits += 1
      }
    }
    val mtl = if (nToks > 0) round4(tokLenSum / nToks) else 0.0
    val sw = if (nToks > 0) round4(stopHits.toDouble / nToks) else 0.0
    val pr = if (n > 0) round4(punct.toDouble / n) else 0.0
    val dr = if (n > 0) round4(digits.toDouble / n) else 0.0
    new GenericInternalRow(Array[Any](n, nToks, mtl, sw, pr, dr))
  }

  private def textStatsGeneric(text: UTF8String): InternalRow = {
    val s = text.toString
    val nChars = text.numChars()
    val toks = tokenizeRaw(text)
    val nToks = toks.length
    var tokLenSum = 0.0
    var stopHits = 0
    var t = 0
    while (t < nToks) {
      val tok = toks(t)
      tokLenSum += tok.length
      if (enSet.contains(tok)) stopHits += 1
      t += 1
    }
    var punct = 0
    var digits = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '.' || c == ',' || c == ';' || c == ':' || c == '!' || c == '?') punct += 1
      if (c >= '0' && c <= '9') digits += 1
      i += 1
    }
    val mtl = if (nToks > 0) round4(tokLenSum / nToks) else 0.0
    val sw = if (nToks > 0) round4(stopHits.toDouble / nToks) else 0.0
    val pr = if (nChars > 0) round4(punct.toDouble / nChars) else 0.0
    val dr = if (nChars > 0) round4(digits.toDouble / nChars) else 0.0
    new GenericInternalRow(Array[Any](nChars, nToks, mtl, sw, pr, dr))
  }

  /** Composite quality score — identical arithmetic to the declarative
    * `TextAnalysis.qualityScore` over the ROUNDED metrics. */
  def qualityScore(text: UTF8String): Double = {
    val m = textStats(text)
    val nToks = m.getInt(1)
    val mtl = m.getDouble(2)
    val pr = m.getDouble(4)
    val dr = m.getDouble(5)
    val lenScore = math.min(nToks.toDouble / 20.0, 1.0)
    val tokScore = if (mtl >= 2.5 && mtl <= 9.0) 1.0 else 0.3
    val punctScore = if (pr < 0.2) 1.0 else 0.2
    val digitScore = if (dr < 0.3) 1.0 else 0.2
    round4(lenScore * 0.4 + tokScore * 0.3 + punctScore * 0.15 + digitScore * 0.15)
  }

  /** One-pass repetition metrics — the training-pipeline repetition
    * filters of Rae et al. 2021 (Gopher, §A1.1: duplicate line
    * fractions; most-frequent-n-gram and duplicated-n-gram character
    * fractions):
    *
    *  - `n_units`: non-empty trimmed units after splitting on `delim`
    *    (lines for `"\n"`, sentences for `"."`)
    *  - `dup_unit_frac`: occurrences beyond each unit's first, over
    *    `n_units`
    *  - `dup_unit_char_frac`: characters of those repeat occurrences,
    *    over total unit characters
    *  - `top_bigram_char_frac`: token characters covered by the most
    *    frequent token bigram (count × bigram token length, ties to
    *    the lexicographically smallest; 0 unless it repeats), over
    *    total token characters
    *  - `dup_5gram_char_frac`: token characters covered by ANY token
    *    5-gram occurring more than once (overlaps counted once), over
    *    total token characters
    *
    * All ratios round4 like [[textStats]] so both engine and oracle
    * state identical values. */
  def repetitionStats(text: UTF8String, delim: String): InternalRow = {
    val s = text.toString
    // unit (line/sentence) repetition
    val units = s.split(java.util.regex.Pattern.quote(delim), -1)
      .iterator.map(_.trim).filter(_.nonEmpty).toArray
    val nUnits = units.length
    var unitChars = 0L
    val unitCounts = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i < nUnits) {
      unitChars += units(i).length
      unitCounts.merge(units(i), 1, (a, b) => a + b)
      i += 1
    }
    var dupUnits = 0L
    var dupUnitChars = 0L
    val uit = unitCounts.entrySet().iterator()
    while (uit.hasNext) {
      val e = uit.next()
      if (e.getValue > 1) {
        dupUnits += e.getValue - 1L
        dupUnitChars += (e.getValue - 1L) * e.getKey.length
      }
    }
    val dupUnitFrac = if (nUnits > 0) round4(dupUnits.toDouble / nUnits) else 0.0
    val dupUnitCharFrac =
      if (unitChars > 0) round4(dupUnitChars.toDouble / unitChars) else 0.0

    // token n-gram repetition over the whole text
    val toks = tokenizeRaw(text)
    val nToks = toks.length
    var tokChars = 0L
    i = 0
    while (i < nToks) { tokChars += toks(i).length; i += 1 }

    var topBigramFrac = 0.0
    if (nToks >= 2 && tokChars > 0) {
      val bigrams = new java.util.HashMap[String, Integer]()
      i = 0
      while (i < nToks - 1) {
        bigrams.merge(toks(i) + " " + toks(i + 1), 1, (a, b) => a + b)
        i += 1
      }
      var bestCount = 0
      var bestKey: String = null
      val bit = bigrams.entrySet().iterator()
      while (bit.hasNext) {
        val e = bit.next()
        if (e.getValue > bestCount ||
            (e.getValue == bestCount && e.getKey.compareTo(bestKey) < 0)) {
          bestCount = e.getValue
          bestKey = e.getKey
        }
      }
      if (bestCount > 1)
        topBigramFrac =
          round4(bestCount.toDouble * (bestKey.length - 1) / tokChars)
    }

    var dup5Frac = 0.0
    val N5 = 5
    if (nToks >= N5 && tokChars > 0) {
      val grams = new Array[String](nToks - N5 + 1)
      val gramCounts = new java.util.HashMap[String, Integer]()
      i = 0
      while (i <= nToks - N5) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = i + 1
        while (j < i + N5) { sb.append(' ').append(toks(j)); j += 1 }
        grams(i) = sb.toString
        gramCounts.merge(grams(i), 1, (a, b) => a + b)
        i += 1
      }
      val covered = new Array[Boolean](nToks)
      i = 0
      while (i <= nToks - N5) {
        if (gramCounts.get(grams(i)) > 1) {
          var j = i
          while (j < i + N5) { covered(j) = true; j += 1 }
        }
        i += 1
      }
      var covChars = 0L
      i = 0
      while (i < nToks) { if (covered(i)) covChars += toks(i).length; i += 1 }
      dup5Frac = round4(covChars.toDouble / tokChars)
    }

    new GenericInternalRow(Array[Any](
      nUnits, dupUnitFrac, dupUnitCharFrac, topBigramFrac, dup5Frac))
  }

  /** Language ID — kernel twin of the declarative argmax (profile
    * order breaks ties, "und" when no profile scores > 0). Token
    * profiles use raw tokens; char profiles use substring occurrence
    * ratios, exactly as the Column formulation. */
  def langId(text: UTF8String): UTF8String =
    if (firstNonAscii(text) < 0) langIdAscii(text) else langIdGeneric(text)

  /** All-ASCII fast path: the zh char profile scores 0 on ASCII text
    * by construction, so only the token profiles compete — one token
    * byte scan with byte-range membership tests, no per-token String.
    * Tie-break and the all-zero→"und" contract match
    * [[langIdGeneric]] exactly (zh is LAST in stopwordProfiles, so
    * dropping its zero score cannot steal a tie). */
  private def langIdAscii(text: UTF8String): UTF8String = {
    val n = text.numBytes()
    val hits = new Array[Int](tokenProfileBytes.length)
    var nToks = 0
    var i = 0
    while (i < n) {
      while (i < n && isWsByte(text.getByte(i))) i += 1
      val start = i
      while (i < n && !isWsByte(text.getByte(i))) i += 1
      if (i > start) {
        nToks += 1
        var p = 0
        while (p < tokenProfileBytes.length) {
          val words = tokenProfileBytes(p)._2
          var w = 0
          var found = false
          while (!found && w < words.length) {
            if (rangeEquals(text, start, i, words(w))) found = true
            w += 1
          }
          if (found) hits(p) += 1
          p += 1
        }
      }
    }
    if (nToks == 0) return undU8
    var best = 0.0
    var p = 0
    while (p < hits.length) {
      val r = hits(p).toDouble / nToks
      if (r > best) best = r
      p += 1
    }
    p = 0
    while (p < hits.length) {
      if (hits(p) > 0 && hits(p).toDouble / nToks == best) return tokenProfileU8(p)
      p += 1
    }
    undU8
  }

  private def langIdGeneric(text: UTF8String): UTF8String = {
    val s = text.toString
    val nChars = text.numChars()
    val toks = tokenizeRaw(text)
    val nToks = toks.length
    val langs = new Array[String](profileSets.length + charProfiles.length)
    val scores = new Array[Double](langs.length)
    var idx = 0
    var p = 0
    while (p < profileSets.length) {
      val (lang, set) = profileSets(p)
      var hits = 0
      var t = 0
      while (t < nToks) {
        if (set.contains(toks(t))) hits += 1
        t += 1
      }
      langs(idx) = lang
      scores(idx) = if (nToks > 0) hits.toDouble / nToks else 0.0
      idx += 1; p += 1
    }
    var c = 0
    while (c < charProfiles.length) {
      val (lang, chars) = charProfiles(c)
      var hits = 0.0
      var j = 0
      while (j < chars.length) {
        hits += countOccurrences(s, chars(j)).toDouble / chars(j).length
        j += 1
      }
      langs(idx) = lang
      scores(idx) = if (nChars > 0) hits / nChars else 0.0
      idx += 1; c += 1
    }
    // declarative order: en, de, fr, es (token profiles) then zh —
    // matches stopwordProfiles order because zh is last there
    var best = 0.0
    var i = 0
    while (i < scores.length) { if (scores(i) > best) best = scores(i); i += 1 }
    i = 0
    while (i < scores.length) {
      if (scores(i) > 0 && scores(i) == best) return UTF8String.fromString(langs(i))
      i += 1
    }
    UTF8String.fromString("und")
  }

  /** Fused language-ID + quality score as one struct — componentwise
    * identical to `(langId(text), qualityScore(text))` (pinned in
    * TextKernelParitySpec) but ONE pass over the text where the
    * separate kernels each re-tokenize and re-sweep char classes. The
    * two are always computed together in the filter stage of a
    * training-data pipeline (keep lang ∈ {…} AND quality ≥ τ), so the
    * fusion halves the dominant per-row cost at corpus scale. */
  def langQuality(text: UTF8String): InternalRow =
    if (firstNonAscii(text) < 0) langQualityAscii(text)
    else new GenericInternalRow(Array[Any](langId(text), qualityScore(text)))

  /** All-ASCII fused path: a single token scan accumulates the
    * language-profile hits ([[langIdAscii]]'s loop) AND the quality
    * metrics ([[textStatsAscii]]'s token/char-class counters — punct
    * and digit bytes are never whitespace, so counting them inside
    * token runs sees every one). Tie-break, rounding, and score
    * arithmetic are copied verbatim from the unfused kernels. */
  private def langQualityAscii(text: UTF8String): InternalRow = {
    val n = text.numBytes()
    val hits = new Array[Int](tokenProfileBytes.length)
    var nToks = 0
    var tokLenSum = 0.0
    var punct = 0
    var digits = 0
    var i = 0
    while (i < n) {
      while (i < n && isWsByte(text.getByte(i))) i += 1
      val start = i
      while (i < n && !isWsByte(text.getByte(i))) {
        val b = text.getByte(i)
        if (b == '.' || b == ',' || b == ';' || b == ':' || b == '!' || b == '?') punct += 1
        else if (b >= '0' && b <= '9') digits += 1
        i += 1
      }
      if (i > start) {
        nToks += 1
        tokLenSum += (i - start)
        var p = 0
        while (p < tokenProfileBytes.length) {
          val words = tokenProfileBytes(p)._2
          var w = 0
          var found = false
          while (!found && w < words.length) {
            if (rangeEquals(text, start, i, words(w))) found = true
            w += 1
          }
          if (found) hits(p) += 1
          p += 1
        }
      }
    }
    var lang = undU8
    if (nToks > 0) {
      var best = 0.0
      var p = 0
      while (p < hits.length) {
        val r = hits(p).toDouble / nToks
        if (r > best) best = r
        p += 1
      }
      p = 0
      var done = false
      while (!done && p < hits.length) {
        if (hits(p) > 0 && hits(p).toDouble / nToks == best) {
          lang = tokenProfileU8(p); done = true
        }
        p += 1
      }
    }
    val mtl = if (nToks > 0) round4(tokLenSum / nToks) else 0.0
    val pr = if (n > 0) round4(punct.toDouble / n) else 0.0
    val dr = if (n > 0) round4(digits.toDouble / n) else 0.0
    val lenScore = math.min(nToks.toDouble / 20.0, 1.0)
    val tokScore = if (mtl >= 2.5 && mtl <= 9.0) 1.0 else 0.3
    val punctScore = if (pr < 0.2) 1.0 else 0.2
    val digitScore = if (dr < 0.3) 1.0 else 0.2
    val q = round4(lenScore * 0.4 + tokScore * 0.3 + punctScore * 0.15 + digitScore * 0.15)
    new GenericInternalRow(Array[Any](lang, q))
  }

  /** Vector kernels reject malformed embeddings loudly instead of
    * silently truncating to the shorter array or NPE-ing on a null
    * element — at 100 TB a silent wrong similarity is unfindable, a
    * task failure with row context is. */
  @inline private def checkVectors(a: ArrayData, b: ArrayData, op: String): Int = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"$op: embedding length mismatch (${a.numElements()} vs ${b.numElements()})")
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"$op: null element at index $i — malformed embedding")
      i += 1
    }
    n
  }

  /** Cosine similarity over double arrays, sequential summation —
    * bit-identical to the declarative
    * `dot/(sqrt(dot(a,a))*sqrt(dot(b,b)))` formulation (and therefore
    * to the DuckDB oracle's list_aggregate sum order). 0.0 when either
    * norm is 0. */
  /** Element read for a vector that may be array<float> OR
    * array<double> (`f` = float, a per-expression constant baked into
    * the generated call). Arithmetic always runs in double, and a
    * float element widens exactly like Spark's `Cast` to
    * array<double> would — so skipping the cast changes NOTHING in the
    * result while removing a per-EVALUATION array allocation (in a
    * knn-join that cast sat inside the pair loop: corpus_rows ×
    * queries allocations). */
  @inline private def vecElem(a: ArrayData, i: Int, f: Boolean): Double =
    if (f) a.getFloat(i).toDouble else a.getDouble(i)

  def cosineAny(a: ArrayData, b: ArrayData, af: Boolean, bf: Boolean): Double = {
    val n = checkVectors(a, b, "cosine_sim")
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = vecElem(a, i, af)
      val y = vecElem(b, i, bf)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom > 0) dot / denom else 0.0
  }

  def cosineDouble(a: ArrayData, b: ArrayData): Double =
    cosineAny(a, b, af = false, bf = false)

  /** Dot product over double arrays (sequential order). */
  def dotAny(a: ArrayData, b: ArrayData, af: Boolean, bf: Boolean): Double = {
    val n = checkVectors(a, b, "dot_product")
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += vecElem(a, i, af) * vecElem(b, i, bf)
      i += 1
    }
    dot
  }

  def dotDouble(a: ArrayData, b: ArrayData): Double =
    dotAny(a, b, af = false, bf = false)

  /** Euclidean distance in ONE pass over sum((a_i-b_i)^2) — the
    * numerically stable form. The three-dot-product identity
    * sqrt(aa - 2ab + bb) cancels catastrophically for near-identical
    * vectors (the near-duplicate regime this engine targets) and can
    * return exactly 0.0 for close-but-distinct vectors. */
  def l2DistanceAny(a: ArrayData, b: ArrayData, af: Boolean, bf: Boolean): Double = {
    val n = checkVectors(a, b, "l2_distance")
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = vecElem(a, i, af) - vecElem(b, i, bf)
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  def l2Distance(a: ArrayData, b: ArrayData): Double =
    l2DistanceAny(a, b, af = false, bf = false)

  // ---- packed float32 vectors (fixed-width binary layout) -------------
  //
  // The reference stores fixed-width values as raw forward indexes
  // (`segment/index/readers/forward/FixedByteChunkSVForwardIndexReader`
  // family) rather than per-element object containers. The packed
  // layout here is the same idea for embedding columns: one BINARY
  // cell = dim × 4 bytes, float32 little-endian, no per-element
  // ArrayData accessor on the kernel hot path — the inner loop reads
  // ints from a byte[] and widens, which the JIT vectorizes. Values
  // are float32 by definition (pack from array<double> narrows, as a
  // float32 embedding store would).

  @inline private def floatLE(a: Array[Byte], off: Int): Double =
    java.lang.Float.intBitsToFloat(
      (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8) |
        ((a(off + 2) & 0xff) << 16) | ((a(off + 3) & 0xff) << 24)).toDouble

  @inline private def checkPacked(a: Array[Byte], b: Array[Byte], op: String): Int = {
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"$op: packed vector byte lengths differ (${a.length} vs ${b.length})")
    if ((a.length & 3) != 0)
      throw new IllegalArgumentException(
        s"$op: packed vector length ${a.length} is not a multiple of 4")
    a.length >> 2
  }

  def cosinePacked(a: Array[Byte], b: Array[Byte]): Double = {
    val n = checkPacked(a, b, "cosine_sim_packed")
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = floatLE(a, i << 2)
      val y = floatLE(b, i << 2)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom > 0) dot / denom else 0.0
  }

  def dotPacked(a: Array[Byte], b: Array[Byte]): Double = {
    val n = checkPacked(a, b, "dot_product_packed")
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += floatLE(a, i << 2) * floatLE(b, i << 2)
      i += 1
    }
    dot
  }

  def l2Packed(a: Array[Byte], b: Array[Byte]): Double = {
    val n = checkPacked(a, b, "l2_distance_packed")
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = floatLE(a, i << 2) - floatLE(b, i << 2)
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  /** array<float|double> → packed float32-LE binary. Null elements are
    * rejected loudly — a silent 0.0 would corrupt similarity math. */
  def packFloats(v: ArrayData, f: Boolean): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](n << 2)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i))
        throw new IllegalArgumentException(
          s"pack_floats: null element at index $i")
      val bits = java.lang.Float.floatToIntBits(
        if (f) v.getFloat(i) else v.getDouble(i).toFloat)
      val off = i << 2
      out(off) = bits.toByte
      out(off + 1) = (bits >> 8).toByte
      out(off + 2) = (bits >> 16).toByte
      out(off + 3) = (bits >> 24).toByte
      i += 1
    }
    out
  }

  /** Packed float32-LE binary → array<float> (the [[packFloats]]
    * inverse; bit-exact round trip for float inputs). */
  def unpackFloats(a: Array[Byte]): ArrayData = {
    if ((a.length & 3) != 0)
      throw new IllegalArgumentException(
        s"unpack_floats: length ${a.length} is not a multiple of 4")
    val n = a.length >> 2
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val off = i << 2
      out(i) = java.lang.Float.intBitsToFloat(
        (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8) |
          ((a(off + 2) & 0xff) << 16) | ((a(off + 3) & 0xff) << 24))
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** Driver-side helper: pack a query vector for use as a literal. */
  def packFloatSeq(v: Seq[Float]): Array[Byte] = {
    val out = new Array[Byte](v.length << 2)
    var i = 0
    while (i < v.length) {
      val bits = java.lang.Float.floatToIntBits(v(i))
      val off = i << 2
      out(off) = bits.toByte
      out(off + 1) = (bits >> 8).toByte
      out(off + 2) = (bits >> 16).toByte
      out(off + 3) = (bits >> 24).toByte
      i += 1
    }
    out
  }

  /** Random-hyperplane LSH bucket id. Exactly reproduces the previous
    * declarative formula: component(p, i) =
    * (pmod(xxhash64(p:int, i:int), 2000001) - 1e6) / 1e6 with Spark's
    * xxhash64 seed chaining (seed 42), bit p set iff the plane dot
    * product is >= 0. One pass per plane over the vector, all in one
    * JVM frame. */
  def lshBucketAny(vec: ArrayData, numPlanes: Int, f: Boolean): Long = {
    require(numPlanes > 0 && numPlanes <= 63,
      s"numPlanes must be in [1, 63], got $numPlanes")
    val n = vec.numElements()
    var bucket = 0L
    var p = 0
    while (p < numPlanes) {
      val seedP = XXH64.hashInt(p, 42L)
      var d = 0.0
      var i = 0
      while (i < n) {
        val h = XXH64.hashInt(i, seedP)
        val m = h % 2000001L
        val pm = if (m < 0) m + 2000001L else m
        d += vecElem(vec, i, f) * ((pm - 1000000.0) / 1000000.0)
        i += 1
      }
      if (d >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  def lshBucket(vec: ArrayData, numPlanes: Int): Long =
    lshBucketAny(vec, numPlanes, f = false)

  /** Nearest-centroid cell id by L2 over a baked-in coarse codebook —
    * the IVF assignment kernel. Centroids ride inside the expression
    * (plan serialization = broadcast), one flat loop per row. */
  def nearestCellAny(vec: ArrayData, centroids: Array[Array[Double]], f: Boolean): Int = {
    val n = vec.numElements()
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      // fail loudly on a malformed embedding, consistent with
      // cosine/dot/l2's checkVectors — silent truncation here would
      // hand back a silently wrong IVF cell assignment
      require(n == cent.length,
        s"nearest_cell: vector dim $n != codebook dim ${cent.length}")
      var d = 0.0
      var i = 0
      while (i < n) {
        val diff = vecElem(vec, i, f) - cent(i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  def nearestCell(vec: ArrayData, centroids: Array[Array[Double]]): Int =
    nearestCellAny(vec, centroids, f = false)

  /** The `nprobe` nearest cells in ascending distance order (ties →
    * lower cell id) — the IVF probe list for a query vector. */
  def nearestCellsAny(vec: ArrayData, centroids: Array[Array[Double]], nprobe: Int,
      f: Boolean): ArrayData = {
    val k = centroids.length
    val dists = new Array[Double](k)
    var c = 0
    val n = vec.numElements()
    while (c < k) {
      val cent = centroids(c)
      require(n == cent.length,
        s"nearest_cells: vector dim $n != codebook dim ${cent.length}")
      var d = 0.0
      var i = 0
      while (i < n) {
        val diff = vecElem(vec, i, f) - cent(i)
        d += diff * diff
        i += 1
      }
      dists(c) = d
      c += 1
    }
    val order = (0 until k).sortBy(i => (dists(i), i)).take(math.min(nprobe, k))
    new GenericArrayData(order.map(_.asInstanceOf[Any]).toArray)
  }

  def nearestCells(vec: ArrayData, centroids: Array[Array[Double]], nprobe: Int): ArrayData =
    nearestCellsAny(vec, centroids, nprobe, f = false)

  /** OR-amplified multi-table LSH: `numTables` independent bucket ids,
    * table t's planes seeded by chaining t into the plane seed
    * (table 0 reproduces [[lshBucket]] exactly). A neighbor is a
    * candidate if it collides in ANY table — for per-plane collision
    * probability p = 1 - θ/π, recall amplifies from p^planes to
    * 1-(1-p^planes)^tables, fixing the geometric recall collapse of a
    * single-probe single table. Candidate cost grows ≤ ×tables and the
    * scoring stays ∝ collisions, not |corpus|². */
  def lshBucketsAny(vec: ArrayData, numPlanes: Int, numTables: Int,
      f: Boolean): ArrayData = {
    require(numTables > 0, s"numTables must be positive, got $numTables")
    require(numPlanes > 0 && numPlanes <= 63,
      s"numPlanes must be in [1, 63], got $numPlanes")
    val n = vec.numElements()
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      val seedT = if (t == 0) 42L else XXH64.hashInt(t, 0x5EEDB00CL)
      var bucket = 0L
      var p = 0
      while (p < numPlanes) {
        val seedP = XXH64.hashInt(p, seedT)
        var d = 0.0
        var i = 0
        while (i < n) {
          val h = XXH64.hashInt(i, seedP)
          val m = h % 2000001L
          val pm = if (m < 0) m + 2000001L else m
          d += vecElem(vec, i, f) * ((pm - 1000000.0) / 1000000.0)
          i += 1
        }
        if (d >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  def lshBuckets(vec: ArrayData, numPlanes: Int, numTables: Int): ArrayData =
    lshBucketsAny(vec, numPlanes, numTables, f = false)

  /** Winnowing document fingerprint (the rolling-hash fingerprinting
    * scheme of Schleimer/Wilkerson/Aiken's MOSS): hash every k-char
    * gram of the normalized text (lowercased, whitespace collapsed to
    * single spaces), slide a window of w consecutive gram hashes and
    * select each window's minimum (rightmost on ties — robust
    * winnowing), return the sorted distinct selections. Guarantees:
    * identical docs → identical fingerprints; any shared substring of
    * length ≥ k+w-1 contributes a shared selection, so overlap ratio
    * estimates shared content. ~n/w samples per doc. */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    require(k > 0 && w > 0, s"k and w must be positive, got k=$k w=$w")
    val s = String.join(" ", tokenize(text): _*)
    val nGrams = s.length - k + 1
    if (nGrams <= 0) {
      return new GenericArrayData(Array(hashStr(UTF8String.fromString(s), Seed1)))
    }
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      hashes(i) = hashStr(UTF8String.fromString(s.substring(i, i + k)), Seed1)
      i += 1
    }
    val selected = new java.util.TreeSet[java.lang.Long]()
    val windows = math.max(nGrams - w + 1, 1)
    var start = 0
    while (start < windows) {
      val end = math.min(start + w, nGrams)
      var minIdx = start
      var j = start + 1
      while (j < end) {
        if (hashes(j) <= hashes(minIdx)) minIdx = j // rightmost min
        j += 1
      }
      selected.add(hashes(minIdx))
      start += 1
    }
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** Integer-valued top-level field of a JSON object, or null when the
    * field is absent, non-integer, or the input isn't an object — a
    * byte-level scanner with no parser allocation, for the hot path
    * where a query extracts ONE scalar from a payload column (the
    * reference evaluates ingest-time JSON paths row-at-a-time through
    * its `FunctionExpressionEvaluator`; Spark's `from_json` pays a
    * Jackson parse + struct materialization per row for the same
    * answer). Tracks object/array depth and in-string state, so a key
    * spelled inside a string VALUE never matches. */
  def jsonGetLong(json: UTF8String, field: String): java.lang.Long = {
    if (json == null) return null
    val b = json.getBytes
    val f = field.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    var depth = 0
    def skipWs(k0: Int): Int = {
      var k = k0
      while (k < b.length &&
        (b(k) == ' ' || b(k) == '\t' || b(k) == '\n' || b(k) == '\r')) k += 1
      k
    }
    while (i < b.length) {
      (b(i): @annotation.switch) match {
        case '{' | '[' => depth += 1; i += 1
        case '}' | ']' => depth -= 1; i += 1
        case '"' =>
          val start = i + 1
          i = start
          while (i < b.length && b(i) != '"') {
            if (b(i) == '\\') i += 2 else i += 1
          }
          val end = i
          i += 1 // past closing quote
          if (depth == 1) {
            val j = skipWs(i)
            // a string token followed by ':' is a top-level key
            if (j < b.length && b(j) == ':' && end - start == f.length) {
              var m = 0
              while (m < f.length && b(start + m) == f(m)) m += 1
              if (m == f.length) {
                var k = skipWs(j + 1)
                var neg = false
                if (k < b.length && b(k) == '-') { neg = true; k += 1 }
                if (k >= b.length || b(k) < '0' || b(k) > '9') return null
                // accumulate the NEGATIVE magnitude (it holds
                // Long.MinValue, which a positive accumulator cannot);
                // overflow ⇒ null, matching try_cast(... AS BIGINT) —
                // a wrapped garbage long must never bucket a row
                var v = 0L
                var overflow = false
                while (k < b.length && b(k) >= '0' && b(k) <= '9') {
                  val d = b(k) - '0'
                  if (v < (Long.MinValue + d) / 10L) overflow = true
                  else v = v * 10L - d
                  k += 1
                }
                // fractional / exponent part => not an integer field
                if (k < b.length && (b(k) == '.' || b(k) == 'e' || b(k) == 'E'))
                  return null
                if (overflow || (!neg && v == Long.MinValue)) return null
                return java.lang.Long.valueOf(if (neg) v else -v)
              }
            }
          }
        case _ => i += 1
      }
    }
    null
  }

  /** Monotone fixed radix cell of a double: the top `bits` bits of the
    * sign-corrected IEEE-754 bit pattern, shifted to [0, 2^bits).
    *
    * The map `s = bits(v) XOR ((bits(v) >> 63) & Long.MaxValue)` is the
    * standard signed-sortable transform — for non-NaN doubles it is
    * strictly monotone in the numeric order (-Inf → most-negative long
    * region, +Inf → most-positive), so truncating to the top bits gives
    * a bucketing whose cell order IS value order WITHOUT knowing the
    * data's min/max first. That property is what lets
    * [[graft.operators.Percentiles.rankSelectKeyed]] fuse its stats
    * pass and first narrowing pass into one scan.
    *
    * `v + 0.0` canonicalizes -0.0 → +0.0 (IEEE: x + 0.0 == x for every
    * other x), keeping the cell assignment consistent with the NUMERIC
    * comparisons (`>=`/`<=`, where -0.0 == 0.0) the narrowing
    * predicates use downstream. NaN must be filtered by the caller. */
  def radixCell(v: Double, bits: Int): Long = {
    val b = java.lang.Double.doubleToLongBits(v + 0.0)
    val s = b ^ ((b >> 63) & Long.MaxValue)
    (s >> (64 - bits)) + (1L << (bits - 1))
  }

  /** Fraction of equal components between two equal-length MinHash
    * signatures — the MinHash Jaccard estimate. */
  def sigAgreement(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }
}
