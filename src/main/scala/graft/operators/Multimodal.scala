package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video content carried as opaque
  * `binary` columns with a typed metadata struct, plus the Spark-side
  * plumbing a media pipeline needs — schema, partition-parallel batch
  * extraction, frame sampling, deterministic stub featurization.
  *
  * The reference has no media operators (this extends the engine per
  * the project brief). Design constraints at 100 TB:
  *  - content is NEVER interpreted driver-side; every transform is a
  *    Column expression or partition-local batch loop;
  *  - still-image decode ([[imageIoExtractor]], `javax.imageio`) and
  *    PCM-audio decode ([[audioIoExtractor]], `javax.sound.sampled`)
  *    are REAL via JDK-built-in codecs; video demux has no JDK codec,
  *    so `stubFeatures` / `frameSample` are clearly-documented
  *    deterministic stand-ins with the same shapes (binary →
  *    fixed-dim vector, binary → array of chunks) a real demuxer
  *    plugs into — swap the kernel, keep the plumbing;
  *  - featurization of a batch of blobs is the expensive step with a
  *    real model; `batchedFeatures` shows the partition-grouped
  *    batching shape (fixed batch size per model invocation) without
  *    shuffling the corpus.
  */
object Multimodal {

  /** media struct: opaque bytes + typed metadata (the "typed metadata"
    * columns a lakehouse media table carries next to the blob). */
  val mediaType: StructType = StructType(Seq(
    StructField("content", BinaryType),
    StructField("mime", StringType),
    StructField("byte_len", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Pack content + metadata into a media struct column. Width/height
    * are parsed from the content's real header bytes
    * ([[graft.functions.MediaOps.imageMeta]] — PNG IHDR / JPEG SOFn /
    * GIF screen descriptor, a codegen kernel reading only the leading
    * bytes); callers may still override with manifest metadata, and
    * -1 marks non-image or unparseable content. */
  def asMedia(content: Column, mime: Column,
      width: Column = lit(null), height: Column = lit(null)): Column = {
    val meta = graft.functions.GraftFunctions.imageMeta(content)
    struct(
      content.as("content"),
      mime.as("mime"),
      octet_length(content).cast("long").as("byte_len"),
      coalesce(width.cast("int"), meta.getField("width"), lit(-1)).as("width"),
      coalesce(height.cast("int"), meta.getField("height"), lit(-1)).as("height"))
  }

  /** Header-parsed image metadata as a standalone projection:
    * (format, width, height), null fields for non-image blobs. */
  def imageMeta(content: Column): Column =
    graft.functions.GraftFunctions.imageMeta(content)

  /** Header-parsed audio metadata as a standalone projection:
    * (format, sample_rate, channels, bits, duration_ms), null fields
    * for non-audio blobs ([[graft.functions.MediaOps.audioMeta]] —
    * RIFF/WAVE chunk walk + Sun AU header, a codegen kernel reading
    * only leading bytes). */
  def audioMeta(content: Column): Column =
    graft.functions.GraftFunctions.audioMeta(content)

  /** Box-walk video metadata as a standalone projection:
    * (format, width, height, duration_ms), null fields for non-video
    * blobs ([[graft.functions.MediaOps.videoMeta]] — ISO-BMFF
    * `ftyp`/`moov`/`mvhd`/`tkhd` walk; sample data never read). */
  def videoMeta(content: Column): Column =
    graft.functions.GraftFunctions.videoMeta(content)

  /** STUB featurizer: `dim` pseudo-features in [0, 1) derived from
    * seeded xxhash64 over the raw bytes — a deterministic stand-in
    * for an image/audio embedding model (the real model replaces this
    * expression; everything downstream — ANN, dedup, aggregation —
    * consumes the same `array<double>` shape). */
  def stubFeatures(content: Column, dim: Int): Column = {
    require(dim > 0, s"dim must be positive, got $dim")
    transform(sequence(lit(0), lit(dim - 1)),
      i => pmod(xxhash64(content, i), lit(1000000L)).cast("double") / lit(1000000.0))
  }

  /** STUB frame sampler: split the blob into `n` equal byte ranges
    * (binary `substr` — stands in for video frame extraction; a real
    * demuxer replaces the slicing, the array<binary> shape stays). */
  def frameSample(content: Column, n: Int): Column = {
    require(n > 0, s"n must be positive, got $n")
    val len = octet_length(content)
    val chunk = greatest((len + lit(n - 1)) / lit(n), lit(1)).cast("int")
    transform(sequence(lit(0), lit(n - 1)),
      i => substr(content, (i * chunk + 1).cast("int"), chunk))
  }

  /** Partition-local fixed-size batching of blobs through an
    * extractor — the invocation shape of a real model server (batch
    * in, feature matrix out). No shuffle: each partition streams its
    * blobs in `batchSize` groups. */
  def batchedFeatures(df: DataFrame, contentCol: String, idCol: String,
      batchSize: Int, extract: Seq[Array[Byte]] => Seq[Array[Double]]): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap { batch =>
        val feats = extract(batch.map(_._2))
        require(feats.length == batch.length,
          s"extractor returned ${feats.length} rows for a batch of ${batch.length}")
        batch.map(_._1).zip(feats)
      })
      .toDF(idCol, "features")
  }

  /** Reference stub extractor for [[batchedFeatures]] tests: byte-sum
    * + length features (computable by any engine for oracle checks). */
  def byteStatsExtractor(dim: Int)(batch: Seq[Array[Byte]]): Seq[Array[Double]] =
    batch.map { bytes =>
      val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
      Array.tabulate(dim)(i => if (i == 0) bytes.length.toDouble else ((sum + i) % 997).toDouble)
    }

  /** REAL image decode extractor for [[batchedFeatures]]: decodes each
    * blob with the JDK's built-in `javax.imageio` codecs (PNG/JPEG/GIF
    * — part of every JRE, headless-safe, zero added dependencies) and
    * emits [width, height, mean R, mean G, mean B]. Blobs ImageIO
    * cannot decode yield a NaN row rather than failing the batch —
    * corrupt media must not kill a 100 TB backfill. This replaces the
    * former "decode is dependency-blocked" stub for still images;
    * [[audioIoExtractor]] does the same for audio, leaving only video
    * stubbed (the JDK carries no video demuxer). */
  def imageIoExtractor(batch: Seq[Array[Byte]]): Seq[Array[Double]] =
    batch.map { bytes =>
      try {
        if (bytes == null) throw new java.io.IOException("null blob")
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) Array.fill(5)(Double.NaN)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          var (r, g, b) = (0L, 0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          Array(w.toDouble, h.toDouble, r.toDouble / n, g.toDouble / n, b.toDouble / n)
        }
      } catch {
        // ImageIO throws RuntimeExceptions (CMMException, IIOException
        // wrappers, index errors) on truncated/corrupt images, not just
        // IOException — ANY decode failure must yield the NaN row, or a
        // single bad blob fails the task 4x and kills the backfill
        case scala.util.control.NonFatal(_) => Array.fill(5)(Double.NaN)
      }
    }

  /** REAL audio decode extractor for [[batchedFeatures]]: decodes each
    * blob with the JDK's built-in `javax.sound.sampled` parsers
    * (PCM WAV / AIFF / AU ship with every JRE — zero added
    * dependencies) and emits
    * [sampleRate, channels, frames, durationSec, rms] with RMS
    * computed over the decoded PCM samples normalized to [-1, 1].
    * Undecodable blobs yield a NaN row rather than failing the batch —
    * corrupt media must not kill a 100 TB backfill. Together with
    * [[imageIoExtractor]] this leaves only video truly stubbed (the
    * JDK carries no video demuxer). */
  def audioIoExtractor(batch: Seq[Array[Byte]]): Seq[Array[Double]] =
    batch.map { bytes =>
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = in.getFormat
        val frames = in.getFrameLength
        val bits = fmt.getSampleSizeInBits
        if (bits != 16 && bits != 8) Array.fill(5)(Double.NaN)
        else {
          val data = in.readAllBytes()
          val n = data.length / (bits / 8)
          var sumSq = 0.0
          var i = 0
          if (bits == 16) {
            val be = fmt.isBigEndian
            while (i < n) {
              val lo = data(2 * i + (if (be) 1 else 0)) & 0xff
              val hi = data(2 * i + (if (be) 0 else 1))
              val s = ((hi << 8) | lo).toShort / 32768.0
              sumSq += s * s
              i += 1
            }
          } else {
            val signed = fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
            while (i < n) {
              val s = (if (signed) data(i).toDouble
                       else (data(i) & 0xff) - 128.0) / 128.0
              sumSq += s * s
              i += 1
            }
          }
          val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
          Array(fmt.getSampleRate.toDouble, fmt.getChannels.toDouble,
            frames.toDouble, frames / fmt.getFrameRate.toDouble, rms)
        }
      } catch {
        // same contract as imageIoExtractor: any decode failure (null
        // blob, truncated stream, codec RuntimeException) → NaN row
        case scala.util.control.NonFatal(_) => Array.fill(5)(Double.NaN)
      }
    }

  /** Deterministic PCM16 WAV fixture encoder (test/ingest tooling, not
    * an operator): a valid RIFF/WAVE container — "fmt " + "data"
    * chunks, little-endian per the RIFF spec — whose mono samples
    * follow a seeded integer pattern so decoded statistics (frame
    * count, duration, RMS) are pure functions of the arguments. */
  def makeWav(sampleRate: Int, frames: Int, seed: Int): Array[Byte] = {
    require(sampleRate > 0 && frames >= 0, s"bad wav args $sampleRate/$frames")
    val dataLen = frames * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)               // PCM
      .putShort(1)               // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)    // byte rate
      .putShort(2)               // block align
      .putShort(16)              // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < frames) {
      // seeded sawtooth-ish pattern; bounded well inside Short range
      buf.putShort((((i * 37 + seed * 101) % 20000) - 10000).toShort)
      i += 1
    }
    buf.array()
  }

  /** Deterministic MP4 fixture encoder (test/ingest tooling, not an
    * operator): a minimal valid ISO-BMFF container — `ftyp` (isom) +
    * `moov`[`mvhd` v0 + `trak`[`tkhd` v0]] + empty `mdat` — whose
    * movie header carries the given timescale/duration and whose
    * single track carries the given 16.16 fixed-point dimensions, so
    * parsed metadata is a pure function of the arguments. */
  def makeMp4(width: Int, height: Int, durationMs: Long,
      timescale: Int = 1000): Array[Byte] = {
    require(width > 0 && height > 0 && durationMs >= 0 && timescale > 0,
      s"bad mp4 args ${width}x$height/$durationMs@$timescale")
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(8 + body.length)
      buf.putInt(8 + body.length).put(typ.getBytes("US-ASCII")).put(body)
      buf.array()
    }
    val ftyp = box("ftyp", java.nio.ByteBuffer.allocate(16)
      .put("isom".getBytes("US-ASCII")).putInt(0x200)
      .put("isom".getBytes("US-ASCII")).put("mp41".getBytes("US-ASCII")).array())
    val duration = durationMs * timescale / 1000L
    require(duration <= 0xffffffffL, "v0 mvhd duration overflows u32")
    val mvhd = {
      val buf = java.nio.ByteBuffer.allocate(100)
      buf.putInt(0)            // version 0 + flags
        .putInt(0).putInt(0)   // creation/modification
        .putInt(timescale).putInt(duration.toInt)
        .putInt(0x00010000)    // rate 1.0
        .putShort(0x0100)      // volume 1.0
      buf.position(buf.position() + 10) // reserved
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        .foreach(buf.putInt)   // identity matrix
      buf.position(buf.position() + 24) // predefined
      buf.putInt(2)            // next track id
      box("mvhd", buf.array())
    }
    val tkhd = {
      val buf = java.nio.ByteBuffer.allocate(84)
      buf.putInt(7)            // version 0 + flags: enabled|in-movie|in-preview
        .putInt(0).putInt(0)   // creation/modification
        .putInt(1)             // track id
        .putInt(0)             // reserved
        .putInt(duration.toInt)
      buf.position(buf.position() + 16) // reserved/layer/group/volume/reserved
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        .foreach(buf.putInt)   // identity matrix
      buf.putInt(width << 16).putInt(height << 16) // 16.16 fixed point
      box("tkhd", buf.array())
    }
    val moov = box("moov", mvhd ++ box("trak", tkhd))
    ftyp ++ moov ++ box("mdat", Array.emptyByteArray)
  }

  /** Deterministic PNG fixture encoder (test/ingest tooling, not an
    * operator): a valid RGB8 PNG of the given dimensions whose pixel
    * (x, y) carries a seeded byte pattern — built directly from the
    * PNG spec (signature + IHDR + IDAT[deflate] + IEND with CRC32s)
    * so fixtures exercise the REAL container layout end to end. */
  def makePng(width: Int, height: Int, seed: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(tag: String, body: Array[Byte]): Unit = {
      val len = body.length
      out.write(Array((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte))
      val tagged = tag.getBytes("US-ASCII") ++ body
      out.write(tagged)
      val crc = new java.util.zip.CRC32()
      crc.update(tagged)
      val c = crc.getValue
      out.write(Array((c >>> 24).toByte, (c >>> 16).toByte,
        (c >>> 8).toByte, c.toByte))
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/no-interlace
      .array()
    chunk("IHDR", ihdr)
    // raw scanlines: filter byte 0 + RGB triples
    val raw = new Array[Byte](height * (1 + 3 * width))
    var i = 0
    var y = 0
    while (y < height) {
      raw(i) = 0; i += 1
      var x = 0
      while (x < width) {
        raw(i) = ((x * 31 + y * 17 + seed) & 0xff).toByte
        raw(i + 1) = ((x * 13 + y * 7 + seed * 3) & 0xff).toByte
        raw(i + 2) = ((x + y + seed * 5) & 0xff).toByte
        i += 3; x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val baos = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) baos.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    chunk("IDAT", baos.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
