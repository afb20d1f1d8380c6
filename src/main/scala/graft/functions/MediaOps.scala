package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level media-header kernels. Pure JVM loops over the blob's
  * leading bytes — no codec dependency, no full decode — invoked from
  * generated code like the [[HashOps]] text kernels, so a metadata
  * backfill over a 100 TB media table is a map-only codegen pass that
  * reads a few hundred bytes per row.
  *
  * Formats are parsed from their published container layouts:
  *  - PNG: 8-byte signature, then the IHDR chunk — width/height are
  *    big-endian u32 at offsets 16/20 (PNG spec §11.2.2, ISO 15948).
  *  - JPEG: FF D8 then marker segments; frame dimensions live in the
  *    SOFn segment (markers C0-CF minus C4/C8/CC): lines at +5,
  *    samples-per-line at +7, both big-endian u16 (ITU T.81 §B.2.2).
  *  - GIF: "GIF87a"/"GIF89a", logical-screen width/height little-endian
  *    u16 at offsets 6/8 (GIF89a spec §18).
  */
object MediaOps {

  /** Unrecognized-format sentinel row: (null, null, null). */
  private val unknown: InternalRow =
    new GenericInternalRow(Array[Any](null, null, null))

  private def row(format: String, w: Int, h: Int): InternalRow =
    if (w <= 0 || h <= 0) unknown
    else new GenericInternalRow(
      Array[Any](UTF8String.fromString(format), w, h))

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** Unrecognized-audio sentinel row: all-null fields. */
  private val unknownAudio: InternalRow =
    new GenericInternalRow(Array[Any](null, null, null, null, null))

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def audioRow(format: String, rate: Int, ch: Int, bits: Int,
      durationMs: Long): InternalRow =
    if (rate <= 0 || ch <= 0) unknownAudio
    else new GenericInternalRow(Array[Any](
      UTF8String.fromString(format), rate, ch, bits, durationMs))

  /** (format, sample_rate, channels, bits, duration_ms) from the
    * blob's container header, or an all-null row when the blob is not
    * recognized audio. Like [[imageMeta]], this reads ONLY header
    * bytes — no sample decode — so a metadata backfill over a media
    * table is a map-only codegen pass.
    *
    * Formats, from their published layouts:
    *  - WAV: "RIFF" + size + "WAVE", then chunk walk ("fmt " carries
    *    format/channels/rate/bits little-endian; "data" size gives
    *    duration = dataLen / byteRate) — RIFF/WAVE spec (MS RIFF 1.0).
    *  - AU: ".snd" magic, big-endian u32 header: data offset @4, data
    *    size @8, encoding @12 (1=mulaw8, 2..5 = linear 8/16/24/32),
    *    sample rate @16, channels @20 (Sun/NeXT audio file format).
    */
  def audioMeta(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 24) return unknownAudio
    // WAV: RIFF....WAVE + chunk walk
    if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      var i = 12
      var rate = 0; var ch = 0; var bits = 0; var byteRate = 0L
      var dataLen = -1L
      while (i + 8 <= b.length && (dataLen < 0 || rate == 0)) {
        val id = new String(b, i, 4, "US-ASCII")
        val len = le32(b, i + 4)
        // malformed: a chunk longer than the blob (also prevents the
        // u32→int wrap stalling the walk on adversarial lengths)
        if (len > b.length.toLong - i - 8) return unknownAudio
        // fields live INSIDE the declared chunk: a fmt chunk shorter
        // than the canonical 16 bytes must not read the next chunk's
        // header bytes as format metadata
        if (id == "fmt " && len >= 16 && i + 24 <= b.length) {
          ch = le16(b, i + 10)
          rate = le32(b, i + 12).toInt
          byteRate = le32(b, i + 16)
          bits = le16(b, i + 22)
        } else if (id == "data") {
          dataLen = len
        }
        // chunks are word-aligned: odd sizes carry a pad byte
        i += 8 + len.toInt + (len.toInt & 1)
      }
      if (rate == 0 || dataLen < 0 || byteRate <= 0) return unknownAudio
      return audioRow("wav", rate, ch, bits, dataLen * 1000L / byteRate)
    }
    // AU: ".snd", big-endian header
    if (b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd') {
      val dataSize = be32(b, 8).toLong & 0xffffffffL
      val encoding = be32(b, 12)
      val rate = be32(b, 16)
      val ch = be32(b, 20)
      // bytes per sample for the linear PCM + mulaw encodings
      val bytesPer = encoding match {
        case 1 | 2 => 1; case 3 => 2; case 4 => 3; case 5 => 4; case _ => 0
      }
      if (bytesPer == 0 || rate <= 0 || ch <= 0) return unknownAudio
      val bits = if (encoding == 1) 8 else bytesPer * 8
      val durMs =
        if (dataSize == 0xffffffffL) -1L // unknown-length marker
        else dataSize * 1000L / (rate.toLong * ch * bytesPer)
      return audioRow("au", rate, ch, bits, durMs)
    }
    unknownAudio
  }

  /** Unrecognized-video sentinel row: all-null fields. */
  private val unknownVideo: InternalRow =
    new GenericInternalRow(Array[Any](null, null, null, null))

  private def be64(b: Array[Byte], i: Int): Long =
    ((be32(b, i) & 0xffffffffL) << 32) | (be32(b, i + 4) & 0xffffffffL)

  /** (format, width, height, duration_ms) from an ISO-BMFF (MP4 /
    * QuickTime) container's box structure, or an all-null row when the
    * blob is not recognized video. A pure box walk — sizes are read
    * and skipped, sample data (`mdat`) is never touched — per the
    * published layout (ISO/IEC 14496-12):
    *  - top level: size(u32 BE) + type(4cc) boxes; size==1 → u64
    *    largesize follows; `ftyp` major_brand picks mp4 vs mov;
    *  - `moov`/`trak` are pure containers (children start right after
    *    the header);
    *  - `mvhd` v0: timescale/duration u32 at payload +12/+16; v1: u32
    *    timescale at +20, u64 duration at +24 (after u64 times);
    *  - `tkhd` v0: 16.16 fixed-point width/height at payload +76/+80;
    *    v1 at +88/+92. The video track is the one with nonzero dims
    *    (audio tracks carry 0×0).
    */
  def videoMeta(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 16) return unknownVideo
    // recognition requires BOTH a valid ftyp brand and a parsed mvhd —
    // random bytes cannot satisfy both, so no magic-number false hits
    var format: String = null
    var timescale = 0L; var duration = -1L; var durKnown = false
    var width = 0; var height = 0

    def walk(from: Int, to: Int, depth: Int): Unit = {
      if (depth > 8) return // bound pathological nesting
      var i = from
      while (i + 8 <= to) {
        val size32 = be32(b, i).toLong & 0xffffffffL
        val typ = new String(b, i + 4, 4, "US-ASCII")
        var header = 8
        var size = size32
        if (size32 == 1) {
          if (i + 16 > to) return
          size = be64(b, i + 8); header = 16
        } else if (size32 == 0) {
          size = (to - i).toLong // box extends to end of enclosing space
        }
        if (size < header || i + size > to) return // malformed: stop
        val p = i + header // payload start
        typ match {
          case "ftyp" if p + 4 <= to =>
            val brand = new String(b, p, 4, "US-ASCII")
            format = if (brand.startsWith("qt")) "mov" else "mp4"
          case "moov" | "trak" =>
            walk(p, (i + size).toInt, depth + 1)
          case "mvhd" if p + 20 <= to =>
            val v = b(p) & 0xff
            // the reserved all-ones duration means "unknown" in BOTH
            // versions, but the marker is version-specific: u32
            // 0xFFFFFFFF for v0, u64 all-ones (parses as -1) for v1 —
            // a v1 duration of exactly 0xFFFFFFFF ticks is a real,
            // known value. Decide here, where the version is in hand.
            if (v == 1 && p + 32 <= to) {
              timescale = be32(b, p + 20).toLong & 0xffffffffL
              duration = be64(b, p + 24)
              durKnown = duration >= 0
              if (!durKnown) duration = 0
            } else if (v == 0) {
              timescale = be32(b, p + 12).toLong & 0xffffffffL
              duration = be32(b, p + 16).toLong & 0xffffffffL
              durKnown = duration != 0xffffffffL
            }
          case "tkhd" if p < to =>
            val v = b(p) & 0xff
            val off = if (v == 1) 88 else 76
            if (p + off + 8 <= to) {
              // 16.16 fixed point; audio tracks carry 0×0
              val w = be32(b, p + off) >>> 16
              val h = be32(b, p + off + 4) >>> 16
              if (w > 0 && h > 0) { width = w; height = h }
            }
          case _ => // skip: mdat, free, mdia, ... (contents never read)
        }
        i += size.toInt
      }
    }
    walk(0, b.length, 0)
    if (format == null || timescale <= 0) return unknownVideo
    // unknown duration nulls ONLY duration_ms (format/dims are still
    // known facts — both versions, consistently); overflow-guard the
    // ms conversion too — a bogus huge duration must surface as null,
    // not a negative wrapped long
    val durMs: Any =
      if (!durKnown || duration > Long.MaxValue / 1000L) null
      else java.lang.Long.valueOf(duration * 1000L / timescale)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(format),
      if (width > 0) width else null,
      if (height > 0) height else null,
      durMs))
  }

  /** (format, width, height) from the blob's header bytes, or an
    * all-null row when the blob is not a recognized raster image. */
  def imageMeta(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 10) return unknown
    // PNG: 89 'P' 'N' 'G' 0D 0A 1A 0A + IHDR (always the first chunk)
    if (b.length >= 24 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      return row("png", be32(b, 16), be32(b, 20))
    // GIF: "GIF87a" | "GIF89a"
    if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return row("gif", le16(b, 6), le16(b, 8))
    // JPEG: FF D8, then walk marker segments to the first SOFn
    if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) return unknown // desynchronized
        // fill bytes: consecutive FFs before a marker are legal padding
        while (i + 1 < b.length && (b(i + 1) & 0xff) == 0xff) i += 1
        if (i + 3 >= b.length) return unknown
        val marker = b(i + 1) & 0xff
        if (marker >= 0xd0 && marker <= 0xd9) {
          i += 2 // RSTn/SOI/EOI are standalone, no length field
        } else {
          val len = be16(b, i + 2)
          if (len < 2) return unknown
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            if (i + 8 >= b.length) return unknown
            return row("jpeg", be16(b, i + 7), be16(b, i + 5))
          }
          i += 2 + len
        }
      }
    }
    unknown
  }
}
