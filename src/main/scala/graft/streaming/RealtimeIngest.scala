package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Realtime ingestion — the reference's defining capability
  * (`realtime-olap` = realtime OLAP) re-expressed on Structured
  * Streaming.
  *
  * Mapping of the reference's consume→seal→commit lifecycle
  * (`pinot-core/.../data/manager/realtime/LLRealtimeSegmentDataManager.java:79-116`
  * — a consuming segment accumulates rows from a stream partition,
  * seals at a row/time threshold, converts to an immutable segment and
  * commits it, `:330,595-632`;
  * `realtime/converter/RealtimeSegmentConverter.java`):
  *
  *  - stream source (Kafka in production, `StreamConfig.java:42-45`;
  *    any Structured Streaming source here — tests use MemoryStream,
  *    a Kafka deployment swaps in `readStream.format("kafka")` with no
  *    other code change);
  *  - each micro-batch COMMIT through the parquet file sink is the
  *    segment commit: the sink's transaction log (`_spark_metadata`)
  *    plus the checkpointed source offsets give exactly-once segment
  *    publication, the same offset-checkpoint + segment-commit
  *    protocol the reference runs through its controller;
  *  - committed parquet files are the immutable segments; the
  *    still-unread tail of the stream is the "consuming segment"
  *    (not yet visible — a documented divergence: the reference can
  *    query in-flight rows, Spark's file sink exposes data at commit
  *    granularity, so freshness = trigger interval).
  *
  * At scale: ingestion parallelism = stream partitions (Spark maps
  * Kafka partitions to tasks 1:1), segment files partition by commit,
  * and the query side reads them like any other parquet table —
  * pruning, pushdown and AQE all apply unchanged.
  */
object RealtimeIngest {

  /** Start the append-only segment sink: every micro-batch commit
    * publishes one immutable segment set, exactly once. */
  def start(stream: DataFrame, segmentDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .format("parquet")
      .option("path", segmentDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()

  /** Start ingestion from a CONFIGURED stream ([[StreamConfig]]): the
    * raw key/value frame decodes with the configured decoder class,
    * then publishes segments exactly like [[start]]. Seal-threshold
    * mapping: `realtime.segment.flush.threshold.size` rides into the
    * source as rows-per-trigger (`StreamConfig.kafkaSourceOptions`),
    * so each committed segment holds at most that many rows;
    * `…threshold.time` is subsumed because a micro-batch commit seals
    * its segment immediately — segments never stay open. */
  def startWithConfig(raw: DataFrame, cfg: StreamConfig,
      schema: org.apache.spark.sql.types.StructType,
      segmentDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    start(cfg.decode(raw, schema), segmentDir, checkpointDir, trigger)

  /** Ingest-time rollup — aggregateMetrics
    * (`indexsegment/mutable/MutableSegmentImpl.java:88,217-219,327`:
    * rows with identical dimension values merge in the consuming
    * segment, metrics summed). Here each micro-batch rolls up before
    * its segment is written, so segment size is bounded by the
    * dimension cardinality per batch, not the event rate; query-time
    * re-aggregation across segments completes the sum (exactly as
    * queries across Pinot segments re-aggregate).
    *
    * Divergence note: uses `foreachBatch` + append, which is
    * at-least-once on batch retry (the reference has the same window —
    * it re-consumes from the checkpointed stream offset if it fails
    * before segment commit). */
  def startWithRollup(stream: DataFrame, dims: Seq[String],
      metrics: Seq[String], segmentDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch
          .groupBy(dims.map(col): _*)
          .agg(count(lit(1)).as("_rolled_rows"),
            metrics.map(m => sum(col(m)).as(m)): _*)
          .write.mode("append").parquet(segmentDir)
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .trigger(trigger)
      .start()

  /** Ingest-time EXACT DEDUP on a stream — the streaming counterpart
    * of [[graft.operators.Dedup.exactDedup]], for training-data
    * pipelines that must drop duplicate documents as they arrive
    * rather than in a nightly batch.
    *
    * `dropDuplicatesWithinWatermark` keys the dedup state on `keyCols`
    * (e.g. a content fingerprint) and — the 100 TB point — BOUNDS the
    * state with the event-time watermark: a key is remembered only
    * within `watermarkDelay` of the stream's max event time, so state
    * size tracks the duplicate-arrival window, not stream history.
    * Duplicates arriving later than the watermark delay are a
    * documented miss (use the batch [[graft.operators.Dedup]] pass for
    * full-history dedup); within the window, semantics are exact
    * first-wins. */
  def startWithDedup(stream: DataFrame, keyCols: Seq[String], timeCol: String,
      watermarkDelay: String, segmentDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    start(
      stream.withWatermark(timeCol, watermarkDelay)
        .dropDuplicatesWithinWatermark(keyCols),
      segmentDir, checkpointDir, trigger)

  /** Read the committed segments back as a queryable table. */
  def readSegments(spark: SparkSession, segmentDir: String): DataFrame =
    spark.read.parquet(segmentDir)
}

/** Hybrid table: one logical table answered from OFFLINE segments up
  * to a time boundary and REALTIME segments after it — the broker-side
  * stitch in `BaseBrokerRequestHandler.java:376-419` (offline side
  * queried with `time <= boundary`, realtime side with
  * `time > boundary`, boundary = the offline table's max time).
  *
  * The union is exactly-once by construction even when the two sides
  * overlap (typical: batch backfill lags the stream): each row lands
  * on exactly one side of the boundary.
  */
object HybridTable {

  /** Stitched view. The boundary is read from the offline side's max
    * time — one tiny metadata-scale aggregation, the Spark analogue of
    * the broker consulting segment metadata; parquet footer stats
    * answer it without reading data columns. */
  def view(offline: DataFrame, realtime: DataFrame, timeCol: String): DataFrame = {
    val row = offline.agg(max(col(timeCol))).head()
    if (row.isNullAt(0)) realtime
    else {
      val boundary = lit(row.get(0))
      offline.filter(col(timeCol) <= boundary)
        .union(realtime.filter(col(timeCol) > boundary))
    }
  }
}
