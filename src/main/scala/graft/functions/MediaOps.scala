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
