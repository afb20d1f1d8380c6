package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.{RealtimeIngest, StreamDecoder}

class StreamDecoderSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  test("JSON decode over Kafka-shaped (key, value) binary columns") {
    val raw = Seq(
      ("k1", """{"event_id": 1, "event_type": "click", "value": 2.5}"""),
      ("k2", """{"event_id": 2, "event_type": "view", "value": 1.0}"""),
      ("k3", """this is not json"""))
      .toDF("k", "v")
      .select(encode($"k", "UTF-8").as("key"), encode($"v", "UTF-8").as("value"))
    val decoded = StreamDecoder.decodeJson(raw, schema)
    assert(decoded.columns.toSeq === Seq("event_id", "event_type", "value"))
    assert(decoded.count() === 2)
    val (good, bad) = StreamDecoder.decodeJsonWithQuarantine(raw, schema)
    assert(good.count() === 2 && bad.count() === 1)
  }

  test("Avro decode over Kafka-shaped binary payloads (decode-or-skip)") {
    import graft.sources.AvroConvert
    val avro = AvroConvert.schemaFor(schema)
    def payload(id: Long, typ: String, v: Double) = AvroConvert.toBytes(
      org.apache.spark.sql.Row(id, typ, v), schema, avro)
    val raw = Seq(
      payload(1L, "click", 2.5),
      Array[Byte](0x7f, 0x00, 0x13), // undecodable
      payload(2L, "view", 1.0))
      .toDF("value")
    val decoded = StreamDecoder.decodeAvro(raw, avro.toString, schema)
    assert(decoded.columns.toSeq === Seq("event_id", "event_type", "value"))
    val rows = decoded.orderBy("event_id").as[(Long, String, Double)].collect().toSeq
    assert(rows === Seq((1L, "click", 2.5), (2L, "view", 1.0)),
      "corrupt payload skipped, rest decoded")

    // streaming path: same decoder over a MemoryStream micro-batch
    val source = MemoryStream[Array[Byte]](spark)
    source.addData(payload(10L, "click", 3.0), Array[Byte](0x01), payload(11L, "view", 4.0))
    val sink = StreamDecoder.decodeAvro(source.toDF.toDF("value"), avro.toString, schema)
      .writeStream.format("memory").queryName("avro_decoded").outputMode("append").start()
    sink.processAllAvailable()
    sink.stop()
    assert(spark.table("avro_decoded").as[(Long, String, Double)].collect().toSet
      === Set((10L, "click", 3.0), (11L, "view", 4.0)))
  }

  test("streaming decode → segment commit end-to-end (Kafka-shaped pipeline)") {
    val seg = Files.createTempDirectory("graft-dec-seg").toFile.getAbsolutePath
    val ckp = Files.createTempDirectory("graft-dec-ckp").toFile.getAbsolutePath
    val source = MemoryStream[(Array[Byte], Array[Byte])](spark)
    source.addData(
      (Array[Byte](1), """{"event_id": 10, "event_type": "click", "value": 3.0}""".getBytes("UTF-8")),
      (Array[Byte](2), """garbage""".getBytes("UTF-8")),
      (Array[Byte](3), """{"event_id": 11, "event_type": "view", "value": 4.0}""".getBytes("UTF-8")))
    val decoded = StreamDecoder.decodeJson(
      source.toDF.toDF("key", "value"), schema)
    RealtimeIngest.start(decoded, seg, ckp).awaitTermination()
    val out = RealtimeIngest.readSegments(spark, seg)
    assert(out.select("event_id").as[Long].collect().sorted.toSeq === Seq(10L, 11L))
  }
}
