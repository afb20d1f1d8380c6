package graft

import org.apache.spark.sql.types._
import graft.streaming.StreamConfig

class StreamConfigSpec extends SparkSpec {
  import spark.implicits._

  private val props = Map(
    "streamType" -> "kafka",
    "stream.kafka.topic.name" -> "events",
    "stream.kafka.consumer.type" -> "simple",
    "stream.kafka.broker.list" -> "broker1:9092,broker2:9092",
    "stream.kafka.consumer.prop.auto.offset.reset" -> "smallest",
    "stream.kafka.consumer.prop.max.partition.fetch.bytes" -> "1048576",
    "stream.kafka.decoder.class.name" ->
      "org.apache.pinot.core.realtime.impl.kafka.KafkaJSONMessageDecoder",
    "stream.kafka.decoder.prop.schema" -> "{}",
    "realtime.segment.flush.threshold.size" -> "200000",
    "realtime.segment.flush.threshold.time" -> "3600000")

  test("parses the reference property map with aliases and defaults") {
    val sc = StreamConfig.fromMap(props)
    assert(sc.streamType === "kafka")
    assert(sc.topicName === "events")
    // legacy "simple" alias maps to LOWLEVEL (StreamConfig.java:96-97)
    assert(sc.consumerTypes === Seq("LOWLEVEL"))
    assert(sc.flushThresholdRows === 200000)
    assert(sc.flushThresholdTimeMillis === 3600000L)
    assert(sc.fetchTimeoutMillis === StreamConfig.DefaultFetchTimeoutMillis)
    // streamType inferred from the key space when not explicit
    assert(StreamConfig.fromMap(props - "streamType").streamType === "kafka")
    // missing required keys fail loudly with the property name
    val err = intercept[IllegalArgumentException](
      StreamConfig.fromMap(props - "stream.kafka.topic.name"))
    assert(err.getMessage.contains("topic.name"))
  }

  test("translates to Structured Streaming kafka source options") {
    val opts = StreamConfig.fromMap(props).kafkaSourceOptions
    assert(opts("subscribe") === "events")
    assert(opts("kafka.bootstrap.servers") === "broker1:9092,broker2:9092")
    // 0.8-era "smallest" → "earliest"
    assert(opts("startingOffsets") === "earliest")
    // consumer props pass through under Spark's kafka. prefix; the
    // offset criteria is consumed by startingOffsets, not passed twice
    assert(opts("kafka.max.partition.fetch.bytes") === "1048576")
    assert(!opts.contains("kafka.auto.offset.reset"))
    // no broker list → loud failure at option-build time
    intercept[IllegalArgumentException](
      StreamConfig.fromMap(props - "stream.kafka.broker.list").kafkaSourceOptions)
  }

  test("configured stream ingests end-to-end (decode + segment commits)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sc = StreamConfig.fromMap(props)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val mem = MemoryStream[String]
    mem.addData("""{"id": 1, "name": "a"}""", """{"id": 2, "name": "b"}""", "corrupt")
    val tmp = java.nio.file.Files.createTempDirectory("graft-streamcfg").toString
    val q = graft.streaming.RealtimeIngest.startWithConfig(
      mem.toDF(), sc, schema, s"$tmp/seg", s"$tmp/ckp", Trigger.AvailableNow())
    q.awaitTermination()
    val rows = spark.read.parquet(s"$tmp/seg").orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a"), (2L, "b")), "decoded segments must hold the valid rows only")
  }

  test("decoder dispatch matches the reference's class names") {
    val sc = StreamConfig.fromMap(props)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val raw = Seq("""{"id": 1, "name": "a"}""", """{"id": 2, "name": "b"}""", "nope")
      .toDF("value")
    val decoded = sc.decode(raw, schema)
    assert(decoded.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq === Seq((1L, "a"), (2L, "b")))
    // unknown decoder class fails loudly
    val badCfg = sc.copy(decoderClass = "com.example.MysteryDecoder")
    intercept[IllegalArgumentException](badCfg.decode(raw, schema))
  }
}
