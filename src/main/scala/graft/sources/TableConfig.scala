package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** The reference's table configuration — the single JSON document that
  * drives a table's whole lifecycle (`pinot-common/.../config/
  * TableConfig.java:43-52`: `tableName`/`tableType`/`segmentsConfig`/
  * `tenants`/`tableIndexConfig`/`metadata`) — parsed from the same
  * JSON shape its samples ship (`pinot-tools/.../conf/
  * sample_offline_table_config.json`, `sample_realtime_table_config
  * .json`) and mapped onto this library's operations by
  * [[TableLifecycle]]:
  *
  *  - `segmentsConfig.timeColumnName`/`timeType` + `retentionTimeUnit`/
  *    `retentionTimeValue` (`SegmentsValidationAndRetentionConfig
  *    .java:36-58`) → [[Minion.enforceRetention]]
  *  - `tableIndexConfig.sortedColumn` / `bloomFilterColumns`
  *    (`IndexingConfig.java:47-50`) → the segment sink's sorted write
  *    and parquet bloom filters; `invertedIndexColumns` need no
  *    hand-built artifact — parquet dictionary + page stats under
  *    pushed filters are the scan-side equivalent
  *  - `tableIndexConfig.streamConfigs` (`IndexingConfig.java:57`) →
  *    [[graft.streaming.StreamConfig]] for the realtime path
  *  - `tableIndexConfig.aggregateMetrics` (`IndexingConfig.java:88`)
  *    → ingest rollup
  *
  * Cluster-management fields with no single-library analog (tenants,
  * replication, segment assignment, load mode) parse and carry
  * through — Spark's cluster manager owns placement and replication.
  */
final case class TableConfig(
    tableName: String,
    tableType: TableConfig.TableType,
    segments: TableConfig.SegmentsConfig,
    indexing: TableConfig.IndexingConfig,
    tenants: Map[String, String],
    customConfigs: Map[String, String],
    quota: TableConfig.QuotaConfig = TableConfig.QuotaConfig(None, None)) {

  /** Retention window in millis, when both unit and value are set
    * (RetentionManager reads the same two fields and skips tables
    * lacking either). */
  def retentionMs: Option[Long] = for {
    unit <- segments.retentionTimeUnit
    value <- segments.retentionTimeValue
    v <- value.toLongOption
    // malformed unit => None (skip), matching RetentionManager.java:111-116's
    // catch-and-warn rather than failing the whole retention pass
    tu <- scala.util.Try(java.util.concurrent.TimeUnit.valueOf(unit.toUpperCase)).toOption
  } yield tu.toMillis(v)
}

object TableConfig {

  sealed trait TableType
  case object Offline extends TableType
  case object Realtime extends TableType

  object TableType {
    /** Case-insensitive parse (TableType.OFFLINE/REALTIME). */
    def fromString(s: String): TableType = s.toUpperCase match {
      case "OFFLINE" => Offline
      case "REALTIME" => Realtime
      case other => throw new IllegalArgumentException(s"Invalid table type: $other")
    }
  }

  /** `segmentsConfig` (SegmentsValidationAndRetentionConfig.java). */
  final case class SegmentsConfig(
      timeColumnName: Option[String],
      timeType: Option[String],
      retentionTimeUnit: Option[String],
      retentionTimeValue: Option[String],
      segmentPushType: Option[String],
      schemaName: Option[String],
      replication: Option[String])

  /** `quota` (QuotaConfig.java:40-41): storage bound (cluster-manager
    * concern, carried through) + per-table max queries per second,
    * enforced by the broker's [[graft.pql.BrokerServer]]. */
  final case class QuotaConfig(
      storage: Option[String],
      maxQueriesPerSecond: Option[Double])

  /** One star-tree definition (`StarTreeIndexConfig.java:29-38`):
    * dimension split order + "FUNCTION__column" metric pairs. */
  final case class StarTreeIndexConfig(
      dimensionsSplitOrder: Seq[String],
      functionColumnPairs: Seq[String],
      maxLeafRecords: Int) {
    /** Metric columns named by the function-column pairs
      * (`AggregationFunctionColumnPair`'s `SUM__col` form). */
    def metricColumns: Seq[String] =
      functionColumnPairs.map(_.split("__", 2).last).distinct
  }

  /** `tableIndexConfig` (IndexingConfig.java:38-88). */
  final case class IndexingConfig(
      loadMode: Option[String],
      invertedIndexColumns: Seq[String],
      sortedColumn: Seq[String],
      bloomFilterColumns: Seq[String],
      noDictionaryColumns: Seq[String],
      aggregateMetrics: Boolean,
      streamConfigs: Map[String, String],
      starTreeIndexConfigs: Seq[StarTreeIndexConfig] = Nil)

  private val mapper = new ObjectMapper

  /** Parse the reference's table-config JSON (TableConfig
    * .fromJsonString). Unknown fields are ignored, like the
    * reference's Jackson binding; `tableName` and `tableType` are
    * required (`TableConfig.java` validation). */
  def fromJsonString(json: String): TableConfig = {
    val root = mapper.readTree(json)
    def opt(n: JsonNode, field: String): Option[String] =
      Option(n).flatMap(x => Option(x.get(field))).filter(!_.isNull).map(_.asText)
    def strings(n: JsonNode, field: String): Seq[String] =
      Option(n).flatMap(x => Option(x.get(field))).toSeq
        .flatMap(_.elements().asScala.map(_.asText()).toSeq)
    def stringMap(n: JsonNode): Map[String, String] =
      Option(n).toSeq.flatMap(_.properties().asScala
        .map(e => e.getKey -> e.getValue.asText())).toMap

    val name = opt(root, "tableName").getOrElse(
      throw new IllegalArgumentException("tableName is required"))
    val ttype = TableType.fromString(opt(root, "tableType").getOrElse(
      throw new IllegalArgumentException("tableType is required")))
    val seg = root.get("segmentsConfig")
    val idx = root.get("tableIndexConfig")
    TableConfig(
      tableName = name,
      tableType = ttype,
      segments = SegmentsConfig(
        timeColumnName = opt(seg, "timeColumnName"),
        timeType = opt(seg, "timeType"),
        retentionTimeUnit = opt(seg, "retentionTimeUnit"),
        retentionTimeValue = opt(seg, "retentionTimeValue"),
        segmentPushType = opt(seg, "segmentPushType"),
        schemaName = opt(seg, "schemaName"),
        replication = opt(seg, "replication")),
      indexing = IndexingConfig(
        loadMode = opt(idx, "loadMode"),
        invertedIndexColumns = strings(idx, "invertedIndexColumns"),
        sortedColumn = strings(idx, "sortedColumn"),
        bloomFilterColumns = strings(idx, "bloomFilterColumns"),
        noDictionaryColumns = strings(idx, "noDictionaryColumns"),
        aggregateMetrics =
          opt(idx, "aggregateMetrics").exists(_.equalsIgnoreCase("true")),
        streamConfigs = stringMap(
          Option(idx).map(_.get("streamConfigs")).orNull),
        starTreeIndexConfigs =
          Option(idx).flatMap(x => Option(x.get("starTreeIndexConfigs"))).toSeq
            .flatMap(_.elements().asScala.toSeq)
            .map { n =>
              StarTreeIndexConfig(
                dimensionsSplitOrder = strings(n, "dimensionsSplitOrder"),
                functionColumnPairs = strings(n, "functionColumnPairs"),
                maxLeafRecords =
                  opt(n, "maxLeafRecords").flatMap(_.toIntOption).getOrElse(10000))
            }),
      tenants = stringMap(root.get("tenants")),
      customConfigs = stringMap(
        Option(root.get("metadata")).map(_.get("customConfigs")).orNull),
      quota = QuotaConfig(
        storage = opt(root.get("quota"), "storage"),
        maxQueriesPerSecond = opt(root.get("quota"), "maxQueriesPerSecond")
          .flatMap(_.toDoubleOption)))
  }
}

/** Config-driven table operations: the controller/server behaviors the
  * reference derives from a [[TableConfig]], each delegating to the
  * library operation the config field maps to. */
object TableLifecycle {
  import org.apache.spark.sql.{DataFrame, SparkSession}

  /** Build an offline segment per the table's indexing config
    * (SegmentGeneratorConfig built from TableConfig): sorted column +
    * per-column bloom filters at the sink. */
  def writeOfflineSegment(config: TableConfig, df: DataFrame,
      segmentDir: String,
      transformer: Ingest.RecordTransformer = Ingest.CompoundTransform(Nil)): Unit = {
    require(config.tableType == TableConfig.Offline,
      s"offline segment write needs an OFFLINE table config, got ${config.tableType}")
    Ingest.writeSegment(df, transformer, segmentDir,
      sortBy = config.indexing.sortedColumn,
      bloomFilterColumns = config.indexing.bloomFilterColumns)
  }

  /** Enforce the table's retention policy over its segment dirs
    * (RetentionManager.manageRetentionForTable: skip when either
    * retention field is missing, else purge by segment end time in
    * the table's `timeType` unit). Returns purged dirs. */
  def enforceRetention(config: TableConfig, spark: SparkSession,
      segmentDirs: Seq[String], nowMs: Long): Seq[String] =
    (config.retentionMs, config.segments.timeColumnName,
        config.segments.timeType) match {
      case (Some(ret), Some(timeCol), Some(unit)) =>
        Minion.enforceRetention(spark, segmentDirs, timeCol,
          java.util.concurrent.TimeUnit.valueOf(unit.toUpperCase), ret, nowMs)
      case _ => Nil // no/partial retention config: RetentionManager skips
    }

  /** Result of [[checkStorageQuota]]
    * (StorageQuotaChecker.QuotaCheckerResponse). */
  final case class QuotaCheck(ok: Boolean, totalBytes: Long,
      allowedBytes: Option[Long], reason: String)

  /** Storage-size string → bytes (`DataSize.toBytes` as the
    * reference's QuotaConfig uses it): plain bytes or K/M/G/T
    * suffixes, case-insensitive. None for unparseable. */
  def storageBytes(s: String): Option[Long] = {
    val m = "^(?i)\\s*([0-9]+(?:\\.[0-9]+)?)\\s*([KMGT]?)B?\\s*$".r
      .findFirstMatchIn(s)
    m.flatMap { g =>
      val mult = g.group(2).toUpperCase match {
        case "" => 1L
        case "K" => 1L << 10
        case "M" => 1L << 20
        case "G" => 1L << 30
        case "T" => 1L << 40
      }
      g.group(1).toDoubleOption.map(v => (v * mult).toLong)
    }
  }

  private def dirBytes(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).toSeq.flatten.map(walk).sum
    walk(new java.io.File(path))
  }

  /** Storage quota check at segment push
    * (`controller/.../validation/StorageQuotaChecker
    * .isSegmentStorageWithinQuota`): the table's size AFTER accepting
    * the incoming segment (existing segments, minus the one being
    * replaced, plus the incoming) must stay within `quota.storage`.
    * No quota configured → always within (the reference returns
    * success without checking). */
  def checkStorageQuota(config: TableConfig, existingSegmentDirs: Seq[String],
      incomingSegmentDir: Option[String] = None): QuotaCheck = {
    val allowed = config.quota.storage.flatMap(storageBytes)
    def canon(p: String) = new java.io.File(p).getCanonicalPath
    val incoming = incomingSegmentDir.map(canon)
    val existing = existingSegmentDirs.map(canon).distinct
      .filterNot(p => incoming.contains(p)) // replacement, not addition
    val total = existing.map(dirBytes).sum +
      incomingSegmentDir.map(dirBytes).getOrElse(0L)
    allowed match {
      case None => QuotaCheck(ok = true, total, None,
        s"table ${config.tableName} has no storage quota")
      case Some(a) if total <= a => QuotaCheck(ok = true, total, Some(a),
        s"within quota: $total <= $a bytes")
      case Some(a) => QuotaCheck(ok = false, total, Some(a),
        s"exceeds quota: $total > $a bytes")
    }
  }

  /** Build and register every star-tree the table config declares
    * (`tableIndexConfig.starTreeIndexConfigs` — segment load builds
    * these in the reference; queries then route to the best covering
    * tree via [[graft.plans.StarTreeRouting]]'s registry). `fact` is
    * the table's DataFrame; `registerPath` the scan root queries will
    * carry. Metrics come from each config's FUNCTION__column pairs;
    * the rollup materializes the full sum/min/max/cnt family per
    * metric (a superset of any declared function set). */
  def buildStarTrees(config: TableConfig, spark: SparkSession,
      fact: DataFrame, registerPath: String,
      materializeDir: Option[String] = None): Seq[graft.plans.StarTree.Index] = {
    // trees persist as their own segments (the reference stores the
    // tree with the segment) — routing to a live cube plan over the
    // fact would re-scan the fact it is meant to bypass
    val base = materializeDir.getOrElse(
      s"${System.getProperty("java.io.tmpdir")}/graft_startree_" +
        registerPath.replaceAll("[^a-zA-Z0-9]", "_") +
        f"_${registerPath.hashCode & 0xffffffffL}%08x")
    config.indexing.starTreeIndexConfigs.zipWithIndex.map { case (st, i) =>
      require(st.dimensionsSplitOrder.nonEmpty,
        "starTreeIndexConfig needs dimensionsSplitOrder")
      require(st.metricColumns.nonEmpty,
        "starTreeIndexConfig needs functionColumnPairs")
      val built = graft.plans.StarTree.build(
        fact, st.dimensionsSplitOrder, st.metricColumns)
      val out = s"$base/st_$i"
      built.rollup.write.mode("overwrite").parquet(out)
      val idx = built.copy(rollup = spark.read.parquet(out))
      graft.plans.StarTreeRegistry.register(registerPath, idx)
      idx
    }
  }

  /** The realtime path's stream configuration
    * (`tableIndexConfig.streamConfigs` → StreamConfig, exactly the
    * property map the reference's RealtimeTableDataManager hands to
    * its consumer factory). */
  def streamConfig(config: TableConfig): graft.streaming.StreamConfig = {
    require(config.tableType == TableConfig.Realtime,
      s"streamConfigs need a REALTIME table config, got ${config.tableType}")
    graft.streaming.StreamConfig.fromMap(config.indexing.streamConfigs)
  }

  /** Start the table's realtime ingestion exactly as its config
    * declares it (the reference's RealtimeTableDataManager wiring):
    * decode per `streamConfigs`, and when
    * `tableIndexConfig.aggregateMetrics` is set, roll each micro-batch
    * up by the SCHEMA's dimension + time columns with the metric
    * columns summed (`MutableSegmentImpl`'s aggregateMetrics
    * semantics) before the segment commits; otherwise publish decoded
    * rows as-is. `roles` is the schema's DIMENSION/METRIC/TIME split
    * ([[graft.pql.PinotSchema.loadRoles]]). */
  def startRealtime(config: TableConfig, raw: DataFrame,
      schema: org.apache.spark.sql.types.StructType,
      roles: graft.pql.PinotSchema.Roles,
      segmentDir: String, checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.streaming.RealtimeIngest
    val cfg = streamConfig(config)
    if (config.indexing.aggregateMetrics) {
      require(roles.metrics.nonEmpty,
        "aggregateMetrics needs metric columns in the schema")
      RealtimeIngest.startWithRollup(cfg.decode(raw, schema),
        dims = roles.dimensions ++ roles.timeColumn.toSeq,
        metrics = roles.metrics,
        segmentDir = segmentDir, checkpointDir = checkpointDir,
        trigger = trigger)
    } else RealtimeIngest.startWithConfig(raw, cfg, schema,
      segmentDir, checkpointDir, trigger)
  }
}
