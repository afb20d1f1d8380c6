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
  *  - real codecs (JPEG/PNG decode, audio resample, video demux) are
  *    NOT in this build's dependency set, so `stubFeatures` /
  *    `frameSample` are clearly-documented deterministic stand-ins
  *    with the same shapes (binary → fixed-dim vector, binary →
  *    array of chunks) a real decoder plugs into — swap the kernel,
  *    keep the plumbing;
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
    * are caller-supplied metadata (from the ingest manifest); -1 =
    * unknown. */
  def asMedia(content: Column, mime: Column,
      width: Column = lit(-1), height: Column = lit(-1)): Column =
    struct(
      content.as("content"),
      mime.as("mime"),
      octet_length(content).cast("long").as("byte_len"),
      width.cast("int").as("width"),
      height.cast("int").as("height"))

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
}
