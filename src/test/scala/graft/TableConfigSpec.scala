package graft

import org.apache.spark.sql.functions._
import graft.sources.{Minion, TableConfig, TableLifecycle}

/** Table-config-driven lifecycle: the reference's table config JSON
  * shape parses and each field drives the operation it governs. */
class TableConfigSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_tableconfig_spec/$name"

  private val offlineJson =
    """{
      |  "tableName": "trips",
      |  "tableType": "OFFLINE",
      |  "segmentsConfig": {
      |    "timeColumnName": "ts_days",
      |    "timeType": "DAYS",
      |    "retentionTimeUnit": "DAYS",
      |    "retentionTimeValue": "30",
      |    "segmentPushType": "APPEND",
      |    "replication": "3"
      |  },
      |  "tenants": {"broker": "brokerOne", "server": "serverOne"},
      |  "tableIndexConfig": {
      |    "loadMode": "MMAP",
      |    "invertedIndexColumns": ["city"],
      |    "sortedColumn": ["ts_days"],
      |    "bloomFilterColumns": ["rider_id"],
      |    "aggregateMetrics": "false"
      |  },
      |  "metadata": {"customConfigs": {"owner": "graft"}}
      |}""".stripMargin

  test("offline config parses every mapped field") {
    val c = TableConfig.fromJsonString(offlineJson)
    assert(c.tableName === "trips")
    assert(c.tableType === TableConfig.Offline)
    assert(c.segments.timeColumnName === Some("ts_days"))
    assert(c.retentionMs === Some(30L * 86400000))
    assert(c.indexing.sortedColumn === Seq("ts_days"))
    assert(c.indexing.bloomFilterColumns === Seq("rider_id"))
    assert(c.indexing.invertedIndexColumns === Seq("city"))
    assert(c.tenants === Map("broker" -> "brokerOne", "server" -> "serverOne"))
    assert(c.customConfigs === Map("owner" -> "graft"))
  }

  test("tableName/tableType required; unknown fields ignored") {
    intercept[IllegalArgumentException](
      TableConfig.fromJsonString("""{"tableType": "OFFLINE"}"""))
    intercept[IllegalArgumentException](
      TableConfig.fromJsonString("""{"tableName": "t"}"""))
    intercept[IllegalArgumentException](TableConfig.fromJsonString(
      """{"tableName": "t", "tableType": "HYBRID"}"""))
    val c = TableConfig.fromJsonString(
      """{"tableName": "t", "tableType": "realtime",
        | "quota": {"storage": "10G", "maxQueriesPerSecond": "7.5"}}""".stripMargin)
    assert(c.tableType === TableConfig.Realtime)
    assert(c.retentionMs === None)
    assert(c.quota.storage === Some("10G"))
    assert(c.quota.maxQueriesPerSecond === Some(7.5))
  }

  test("malformed retentionTimeUnit yields None (skip), not a throw") {
    // RetentionManager.java:111-116 catches the bad unit and skips the
    // table with a warning; retentionMs mirrors that as None
    val c = TableConfig.fromJsonString(
      """{"tableName": "t", "tableType": "OFFLINE",
        | "segmentsConfig": {"retentionTimeUnit": "FORTNIGHTS",
        |                    "retentionTimeValue": "2"}}""".stripMargin)
    assert(c.retentionMs === None)
  }

  test("writeOfflineSegment applies sortedColumn and bloomFilterColumns") {
    val c = TableConfig.fromJsonString(offlineJson)
    val df = Seq((3L, "nyc", 300L), (1L, "sf", 100L), (2L, "nyc", 200L))
      .toDF("ts_days", "city", "rider_id")
    val seg = tmp("off")
    TableLifecycle.writeOfflineSegment(c, df.coalesce(1), seg)
    // sorted within the file by ts_days
    val back = spark.read.parquet(seg)
    assert(back.select($"ts_days").as[Long].collect().toSeq === Seq(1L, 2L, 3L))
    // bloom filter present on rider_id
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val f = new java.io.File(seg).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(
      new Path(f.getAbsolutePath), spark.sessionState.newHadoopConf()))
    try {
      val block = r.getRowGroups.get(0)
      val chunk = block.getColumns.asScala
        .find(_.getPath.toDotString == "rider_id").get
      assert(r.getBloomFilterDataReader(block).readBloomFilter(chunk) != null)
    } finally r.close()
    // REALTIME config refuses the offline sink
    val rt = TableConfig.fromJsonString(
      """{"tableName": "t", "tableType": "REALTIME"}""")
    intercept[IllegalArgumentException](
      TableLifecycle.writeOfflineSegment(rt, df, tmp("off2")))
  }

  test("enforceRetention follows segmentsConfig in the table's time unit") {
    val c = TableConfig.fromJsonString(offlineJson) // 30 DAYS retention, ts in DAYS
    val nowMs = java.time.Instant.parse("2020-06-15T00:00:00Z").toEpochMilli
    val nowDays = nowMs / 86400000
    def seg(name: String, days: Seq[Long]): String = {
      val p = tmp(s"ret_$name")
      days.zipWithIndex.map { case (d, i) => (i.toLong, d) }.toDF("id", "ts_days")
        .coalesce(1).write.mode("overwrite").parquet(p)
      p
    }
    val old = seg("old", Seq(nowDays - 40))
    val fresh = seg("fresh", Seq(nowDays - 3))
    assert(TableLifecycle.enforceRetention(c, spark, Seq(old, fresh), nowMs)
      === Seq(old))
    assert(new java.io.File(fresh).exists())
    // a config with no retention fields purges nothing
    val none = TableConfig.fromJsonString(
      """{"tableName": "t", "tableType": "OFFLINE"}""")
    assert(TableLifecycle.enforceRetention(none, spark, Seq(fresh), nowMs) === Nil)
    assert(new java.io.File(fresh).exists())
  }

  test("storage quota: size parsing and push-time check with replacement") {
    assert(TableLifecycle.storageBytes("1024") === Some(1024L))
    assert(TableLifecycle.storageBytes("10K") === Some(10L << 10))
    assert(TableLifecycle.storageBytes("1.5G") === Some((1.5 * (1L << 30)).toLong))
    assert(TableLifecycle.storageBytes("2TB") === Some(2L << 40))
    assert(TableLifecycle.storageBytes("huge") === None)

    def seg(name: String, rows: Int): String = {
      val p = tmp(s"quota_$name")
      (1 to rows).map(i => (i.toLong, s"v$i")).toDF("id", "v")
        .coalesce(1).write.mode("overwrite").parquet(p)
      p
    }
    val s1 = seg("s1", 100)
    val s2 = seg("s2", 100)
    val tight = TableConfig.fromJsonString(
      """{"tableName": "t", "tableType": "OFFLINE", "quota": {"storage": "3K"}}""")
    val within = TableLifecycle.checkStorageQuota(tight, Seq(s1))
    assert(within.ok, within.reason)
    val over = TableLifecycle.checkStorageQuota(tight, Seq(s1), Some(s2))
    assert(!over.ok && over.reason.contains("exceeds"), over.reason)
    // replacing an existing segment does not double-count it
    val replace = TableLifecycle.checkStorageQuota(tight, Seq(s1), Some(s1))
    assert(replace.ok, replace.reason)
    // no quota → always within
    val none = TableConfig.fromJsonString(
      """{"tableName": "t", "tableType": "OFFLINE"}""")
    assert(TableLifecycle.checkStorageQuota(none, Seq(s1, s2)).ok)
  }

  test("starTreeIndexConfigs parse and build registered, routable trees") {
    import graft.plans.StarTreeRegistry
    val c = TableConfig.fromJsonString(
      """{
        |  "tableName": "li",
        |  "tableType": "OFFLINE",
        |  "tableIndexConfig": {
        |    "starTreeIndexConfigs": [
        |      {"dimensionsSplitOrder": ["flag"],
        |       "functionColumnPairs": ["SUM__qty", "MAX__qty"],
        |       "maxLeafRecords": 5000},
        |      {"dimensionsSplitOrder": ["flag", "status"],
        |       "functionColumnPairs": ["SUM__qty"]}
        |    ]
        |  }
        |}""".stripMargin)
    assert(c.indexing.starTreeIndexConfigs.size === 2)
    assert(c.indexing.starTreeIndexConfigs.head.metricColumns === Seq("qty"))
    assert(c.indexing.starTreeIndexConfigs.head.maxLeafRecords === 5000)

    val factDir = tmp("st_fact")
    Seq(("A", "O", 1.0), ("A", "F", 2.0), ("B", "O", 3.0), ("A", "O", 4.0))
      .toDF("flag", "status", "qty").write.mode("overwrite").parquet(factDir)
    val fact = spark.read.parquet(factDir)
    Graft.enable(spark)
    StarTreeRegistry.clear()
    try {
      val built = TableLifecycle.buildStarTrees(c, spark, fact, factDir)
      assert(built.size === 2)
      assert(StarTreeRegistry.lookupAll(factDir).size === 2)
      // a covered group-by routes off the fact scan and stays correct
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val q = fact.groupBy($"flag").agg(sum($"qty").as("s"))
      val scans = q.queryExecution.optimizedPlan.collect {
        case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
          fs.location.rootPaths.map(_.toString)
      }.flatten
      assert(scans.nonEmpty && scans.forall(_.contains("graft_startree")),
        s"fact still scanned: $scans")
      assert(scans.forall(_.endsWith("/st_0")), s"narrow tree not chosen: $scans")
      assert(q.orderBy($"flag").as[(String, Double)].collect().toSeq ===
        Seq(("A", 7.0), ("B", 3.0)))
    } finally StarTreeRegistry.clear()
  }

  test("startRealtime honors aggregateMetrics: micro-batch rollup by schema roles") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.pql.PinotSchema
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val schemaPath = tmp("rt_schema.json")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(schemaPath).getParent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(schemaPath),
      """{
        |  "schemaName": "events",
        |  "dimensionFieldSpecs": [{"name": "etype", "dataType": "STRING"}],
        |  "metricFieldSpecs": [{"name": "v", "dataType": "DOUBLE"}],
        |  "timeFieldSpec": {"incomingGranularitySpec":
        |    {"name": "hour", "dataType": "LONG", "timeType": "HOURS"}}
        |}""".stripMargin)
    val schema = PinotSchema.load(spark, schemaPath)
    val roles = PinotSchema.loadRoles(spark, schemaPath)
    assert(roles === PinotSchema.Roles(Seq("etype"), Seq("v"), Some("hour")))

    val c = TableConfig.fromJsonString(
      """{
        |  "tableName": "events",
        |  "tableType": "REALTIME",
        |  "tableIndexConfig": {
        |    "aggregateMetrics": "true",
        |    "streamConfigs": {
        |      "streamType": "kafka",
        |      "stream.kafka.consumer.type": "lowLevel",
        |      "stream.kafka.topic.name": "events",
        |      "stream.kafka.decoder.class.name": "org.apache.pinot.core.realtime.impl.kafka.KafkaJSONMessageDecoder"
        |    }
        |  }
        |}""".stripMargin)
    val source = MemoryStream[String](spark)
    source.addData(
      """{"etype": "click", "v": 1.0, "hour": 1}""",
      """{"etype": "click", "v": 2.0, "hour": 1}""",
      """{"etype": "view", "v": 5.0, "hour": 1}""",
      """{"etype": "click", "v": 4.0, "hour": 2}""")
    val seg = tmp("rt_seg")
    val q = TableLifecycle.startRealtime(c, source.toDF(), schema, roles,
      seg, tmp("rt_ckpt"))
    q.processAllAvailable(); q.stop()
    val out = spark.read.parquet(seg)
      .orderBy($"etype", $"hour")
      .select($"etype", $"hour", $"v", $"_rolled_rows")
      .as[(String, Long, Double, Long)].collect().toSeq
    assert(out === Seq(
      ("click", 1L, 3.0, 2L), ("click", 2L, 4.0, 1L), ("view", 1L, 5.0, 1L)))
  }

  test("realtime streamConfigs drive the stream configuration") {
    val c = TableConfig.fromJsonString(
      """{
        |  "tableName": "events",
        |  "tableType": "REALTIME",
        |  "tableIndexConfig": {
        |    "streamConfigs": {
        |      "streamType": "kafka",
        |      "stream.kafka.consumer.type": "simple",
        |      "stream.kafka.topic.name": "events-topic",
        |      "stream.kafka.broker.list": "localhost:9092",
        |      "stream.kafka.decoder.class.name": "org.apache.pinot.core.realtime.impl.kafka.KafkaJSONMessageDecoder",
        |      "realtime.segment.flush.threshold.size": "1000"
        |    }
        |  }
        |}""".stripMargin)
    val sc = TableLifecycle.streamConfig(c)
    assert(sc.topicName === "events-topic")
    assert(sc.consumerTypes === Seq("LOWLEVEL")) // 'simple' legacy alias
    assert(sc.flushThresholdRows === 1000)
    val opts = sc.kafkaSourceOptions
    assert(opts("subscribe") === "events-topic")
    // an OFFLINE table has no stream config
    intercept[IllegalArgumentException](TableLifecycle.streamConfig(
      TableConfig.fromJsonString("""{"tableName": "t", "tableType": "OFFLINE"}""")))
  }
}
