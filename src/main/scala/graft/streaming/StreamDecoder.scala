package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Stream payload decoders — the reference's Kafka message decoders
  * (`realtime/impl/kafka/KafkaJSONMessageDecoder.java`,
  * `KafkaAvroMessageDecoder.java`; selected by `StreamConfig.java:42-45`)
  * as streaming-safe Column transforms over a raw (key, value) frame.
  *
  * Works identically on a real Kafka source (`readStream.format
  * ("kafka")` yields `key: binary, value: binary` plus topic/partition/
  * offset metadata) and on test MemoryStreams with the same column
  * shape. Decode failures follow the reference's decoder contract
  * (bad row → skipped, `KafkaJSONMessageDecoder.java` catches and
  * logs): `from_json` yields null structs which are filtered, with a
  * `_corrupt` passthrough variant for quarantine pipelines.
  *
  * Avro: `from_avro` needs the spark-avro jar (absent here), so
  * [[decodeAvro]] decodes the binary payload with the Avro runtime
  * directly — `KafkaAvroMessageDecoder.java` semantics: one configured
  * reader schema, per-message BinaryDecoder (reused within a
  * partition), undecodable payloads skipped.
  */
object StreamDecoder {

  private val CorruptCol = "_corrupt_record"

  /** (parsed-with-corrupt-marker) intermediate: `from_json` in
    * PERMISSIVE mode nulls every FIELD of a malformed payload rather
    * than the struct, so corruption is detected via the dedicated
    * corrupt-record column, not struct nullness. */
  private def parsed(raw: DataFrame, schema: StructType, valueCol: String): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema may not declare $CorruptCol")
    raw.withColumn("_rec", from_json(col(valueCol).cast("string"),
      schema.add(CorruptCol, StringType),
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol).asJava))
  }

  /** JSON-decode `value` against an explicit schema, keeping the
    * caller's metadata columns. Rows that fail to decode are dropped
    * (decoder-skip semantics). */
  def decodeJson(raw: DataFrame, schema: StructType,
      valueCol: String = "value", keep: Seq[String] = Nil): DataFrame =
    parsed(raw, schema, valueCol)
      .filter(col(s"_rec.$CorruptCol").isNull)
      .select(keep.map(col) :+ col("_rec.*"): _*)
      .drop(CorruptCol)

  /** Avro-decode a binary `value` column against the configured
    * writer/reader schema (JSON form), yielding rows of `schema`.
    * Streaming-safe (`mapPartitions` on a typed Dataset); the decoder
    * and datum reader are constructed once per partition and the
    * BinaryDecoder is reused across records — the same
    * decode-or-skip loop as the reference's KafkaAvroMessageDecoder
    * (it logs-and-drops on corrupt payloads). `mapPartitions` is the
    * right shape here, not a UDF: the Avro runtime is per-partition
    * stateful (decoder reuse) and returns a full row, not a scalar. */
  def decodeAvro(raw: DataFrame, avroSchemaJson: String, schema: StructType,
      valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.Encoders
    val fields = schema.fields
    raw.select(col(valueCol).cast("binary")).as(Encoders.BINARY)
      .mapPartitions { iter =>
        val avro = new org.apache.avro.Schema.Parser().parse(avroSchemaJson)
        val reader = new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord](avro)
        var decoder: org.apache.avro.io.BinaryDecoder = null
        iter.flatMap { bytes =>
          try {
            decoder = org.apache.avro.io.DecoderFactory.get().binaryDecoder(bytes, decoder)
            Some(graft.sources.AvroConvert.toRow(reader.read(null, decoder), fields))
          } catch { case _: Exception => None }
        }
      }(Encoders.row(schema))
  }

  /** Same, but quarantines undecodable payloads instead of dropping:
    * returns (decoded, corrupt-raw) frames. */
  def decodeJsonWithQuarantine(raw: DataFrame, schema: StructType,
      valueCol: String = "value"): (DataFrame, DataFrame) = {
    val p = parsed(raw, schema, valueCol)
    (p.filter(col(s"_rec.$CorruptCol").isNull).select(col("_rec.*")).drop(CorruptCol),
      p.filter(col(s"_rec.$CorruptCol").isNotNull).drop("_rec"))
  }
}
