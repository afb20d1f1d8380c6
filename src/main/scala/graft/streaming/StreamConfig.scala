package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** The reference's realtime stream configuration, parsed from the same
  * property map users put in their table config and translated to
  * Structured Streaming terms — the layer that makes the Kafka path
  * swap-in when a broker exists, with everything around it testable
  * without one.
  *
  * Key space (`StreamConfigProperties.java:36-50`: `stream.<type>.
  * <property>`; kafka-specific names `KafkaStreamConfigProperties
  * .java:29-51`; parsing + defaults `StreamConfig.java:48-54,90-146`):
  *
  *  - `stream.kafka.topic.name` → the `subscribe` option
  *  - `stream.kafka.broker.list` → `kafka.bootstrap.servers`
  *  - `stream.kafka.consumer.type` → HIGHLEVEL / LOWLEVEL (the legacy
  *    "simple" alias maps to LOWLEVEL, `StreamConfig.java:96-97`);
  *    informational here — Spark's Kafka source is offset-tracked like
  *    the reference's low-level consumer
  *  - `stream.kafka.consumer.prop.auto.offset.reset` → `startingOffsets`
  *    ("smallest" → "earliest", "largest" → "latest", same semantics
  *    under the Kafka 0.8-era names the reference uses)
  *  - `stream.kafka.decoder.class.name` → [[StreamDecoder]] selection
  *    (`KafkaJSONMessageDecoder` / `KafkaAvroMessageDecoder` by class
  *    simple name, matching the reference's reflective instantiation)
  *  - `stream.kafka.decoder.prop.*` → decoder properties (e.g. the
  *    Avro writer schema)
  *  - `stream.kafka.consumer.prop.*` → passed through with Spark's
  *    `kafka.` option prefix
  *  - `realtime.segment.flush.threshold.{size,time}` → the segment
  *    seal policy [[RealtimeIngest]] enforces per micro-batch commit
  */
final case class StreamConfig(
    streamType: String,
    topicName: String,
    consumerTypes: Seq[String],
    brokerList: Option[String],
    offsetCriteria: String,
    decoderClass: String,
    decoderProps: Map[String, String],
    fetchTimeoutMillis: Int,
    connectionTimeoutMillis: Long,
    flushThresholdRows: Int,
    flushThresholdTimeMillis: Long,
    consumerProps: Map[String, String]) {

  /** Option map for `spark.readStream.format("kafka")` — what a real
    * deployment passes verbatim once the kafka source jar is present. */
  def kafkaSourceOptions: Map[String, String] = {
    val brokers = brokerList.getOrElse(throw new IllegalArgumentException(
      s"stream.$streamType.broker.list is required for the kafka source"))
    Map(
      "subscribe" -> topicName,
      "kafka.bootstrap.servers" -> brokers,
      "startingOffsets" -> (offsetCriteria.toLowerCase match {
        case "smallest" | "earliest" => "earliest"
        case "largest" | "latest" => "latest"
        case other => other // explicit per-partition offset JSON passes through
      }),
      // the reference's consumer resumes from its own committed offsets
      // after redeploy; Spark's checkpointed offsets are that contract
      "kafkaConsumer.pollTimeoutMs" -> fetchTimeoutMillis.toString,
      // flush.threshold.size bounds the consuming segment's rows; with
      // one segment commit per micro-batch, rows-per-trigger IS that
      // bound (flush.threshold.time is subsumed: every commit seals
      // its segment immediately, segments never stay open)
      "maxOffsetsPerTrigger" -> flushThresholdRows.toString
    ) ++ consumerProps.map { case (k, v) => s"kafka.$k" -> v }
  }

  /** Decode a raw key/value micro-batch with the configured decoder —
    * the reference's `StreamMessageDecoder` reflective dispatch
    * (`KafkaJSONMessageDecoder` / `KafkaAvroMessageDecoder`). */
  def decode(raw: DataFrame, schema: StructType): DataFrame =
    decoderClass.split('.').last match {
      case "KafkaJSONMessageDecoder" =>
        StreamDecoder.decodeJson(raw, schema)
      case "KafkaAvroMessageDecoder" =>
        val avroSchema = decoderProps.getOrElse("schema",
          throw new IllegalArgumentException(
            s"stream.$streamType.decoder.prop.schema (Avro writer schema) is required"))
        StreamDecoder.decodeAvro(raw, avroSchema, schema)
      case other => throw new IllegalArgumentException(
        s"unsupported decoder class '$other'")
    }
}

object StreamConfig {

  /** `StreamConfig.java:48-54` */
  val DefaultFlushThresholdRows = 5000000
  val DefaultFlushThresholdTimeMillis: Long = 6L * 60 * 60 * 1000
  val DefaultFetchTimeoutMillis = 5000
  val DefaultConnectionTimeoutMillis = 30000L

  /** Parse the reference's property map (`stream.<type>.<prop>` plus
    * the unprefixed `realtime.segment.flush.*` keys). Unknown stream
    * types work as long as the generic properties resolve — the
    * reference's factory is likewise type-agnostic. */
  def fromMap(props: Map[String, String]): StreamConfig = {
    val streamType = props.getOrElse("streamType",
      props.keys.collectFirst { case k if k.startsWith("stream.") =>
        k.split('.')(1)
      }.getOrElse(throw new IllegalArgumentException(
        "no streamType and no stream.<type>.* properties")))
    def p(name: String): Option[String] = props.get(s"stream.$streamType.$name")
    def req(name: String): String = p(name).getOrElse(
      throw new IllegalArgumentException(s"missing stream.$streamType.$name"))
    val consumerTypes = req("consumer.type").split(',').toSeq
      .map(_.trim.toLowerCase)
      .map {
        // legacy alias, StreamConfig.java:96-97
        case "simple" | "lowlevel" => "LOWLEVEL"
        case "highlevel" => "HIGHLEVEL"
        case other => throw new IllegalArgumentException(
          s"unknown consumer.type '$other'")
      }
    val decoderPropPrefix = s"stream.$streamType.decoder.prop."
    val consumerPropPrefix = s"stream.$streamType.consumer.prop."
    StreamConfig(
      streamType = streamType,
      topicName = req("topic.name"),
      consumerTypes = consumerTypes,
      brokerList = p("broker.list"),
      offsetCriteria = p("consumer.prop.auto.offset.reset").getOrElse("largest"),
      decoderClass = req("decoder.class.name"),
      decoderProps = props.collect {
        case (k, v) if k.startsWith(decoderPropPrefix) =>
          k.stripPrefix(decoderPropPrefix) -> v
      },
      fetchTimeoutMillis = p("fetch.timeout.millis")
        .map(_.toInt).getOrElse(DefaultFetchTimeoutMillis),
      connectionTimeoutMillis = p("connection.timeout.millis")
        .map(_.toLong).getOrElse(DefaultConnectionTimeoutMillis),
      flushThresholdRows = props.get("realtime.segment.flush.threshold.size")
        .map(_.toInt).getOrElse(DefaultFlushThresholdRows),
      flushThresholdTimeMillis = props.get("realtime.segment.flush.threshold.time")
        .map(_.toLong).getOrElse(DefaultFlushThresholdTimeMillis),
      consumerProps = props.collect {
        case (k, v) if k.startsWith(consumerPropPrefix) &&
            !k.endsWith("auto.offset.reset") =>
          k.stripPrefix(consumerPropPrefix) -> v
      })
  }
}
