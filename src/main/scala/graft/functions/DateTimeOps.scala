package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's datetime format-spec library re-expressed as Column
  * transforms.
  *
  * Pinot datetime columns carry a format string
  * `size:timeUnit:EPOCH|SIMPLE_DATE_FORMAT[:pattern]` and queries
  * convert between formats with a bucketing granularity `size:timeUnit`
  * (`pinot-common/.../data/DateTimeFormatSpec.java`,
  * `DateTimeGranularitySpec.java`,
  * `DateTimeConversionTransformFunction.java:37-75`); plain epoch
  * unit-to-unit conversion is `timeConvert`
  * (`TimeConversionTransformFunction.java:1-79`).
  *
  * Everything compiles to native Column arithmetic /
  * `to_timestamp`/`date_format` — codegen'd, pushdown-friendly, no
  * UDFs. Conversions go through epoch milliseconds; granularity
  * bucketing is truncating division on the millis value (the
  * reference's `granularityToMillis` floor), so results are
  * deterministic and SQL-portable for the oracle.
  */
object DateTimeOps {

  private val unitMillis: Map[String, Long] = Map(
    "MILLISECONDS" -> 1L,
    "SECONDS" -> 1000L,
    "MINUTES" -> 60000L,
    "HOURS" -> 3600000L,
    "DAYS" -> 86400000L)

  private def unitMs(unit: String): Long =
    unitMillis.getOrElse(unit.toUpperCase,
      throw new IllegalArgumentException(
        s"unsupported time unit '$unit' (expected one of ${unitMillis.keys.mkString(", ")})"))

  /** Parsed `size:timeUnit:EPOCH|SIMPLE_DATE_FORMAT[:pattern]`. */
  final case class FormatSpec(size: Int, unit: String, sdfPattern: Option[String]) {
    require(size > 0, s"format size must be positive, got $size")
    val millisPerBucket: Long = size * unitMs(unit)

    /** Column in this format → epoch millis. SDF goes through
      * `unix_millis`, not `unix_timestamp` (second precision) — the
      * reference's DateTimeFormatSpec parses SDF values to full
      * millisecond precision, so sub-second pattern fields (`...SSS`)
      * must survive the conversion. */
    def toMillis(c: Column): Column = sdfPattern match {
      case None => c.cast("long") * lit(millisPerBucket)
      case Some(p) => unix_millis(to_timestamp(c, p))
    }

    /** Epoch millis → column in this format. The division happens on a
      * value already floored to a bucket multiple, so the double
      * intermediate is exact for any epoch below 2^53 ms (year ~287396). */
    def fromMillis(ms: Column): Column = sdfPattern match {
      case None => ((ms - pmod(ms, lit(millisPerBucket))) / lit(millisPerBucket)).cast("long")
      case Some(p) => date_format(timestamp_millis(ms), p)
    }
  }

  /** Parse `size:timeUnit:EPOCH|SIMPLE_DATE_FORMAT[:pattern]`
    * (DateTimeFormatSpec.java's column format). */
  def parseFormat(spec: String): FormatSpec = spec.split(":", 4) match {
    case Array(size, unit, "EPOCH") =>
      FormatSpec(size.toInt, unit, None)
    case Array(size, unit, "SIMPLE_DATE_FORMAT", pattern) =>
      FormatSpec(size.toInt, unit, Some(pattern))
    case _ => throw new IllegalArgumentException(
      s"bad datetime format '$spec' (expected size:timeUnit:EPOCH or " +
        "size:timeUnit:SIMPLE_DATE_FORMAT:pattern)")
  }

  /** Parse granularity `size:timeUnit` → millis per bucket
    * (DateTimeGranularitySpec.java). */
  def parseGranularityMillis(spec: String): Long = spec.split(":", 2) match {
    case Array(size, unit) =>
      val s = size.toInt
      require(s > 0, s"granularity size must be positive, got $s")
      s * unitMs(unit)
    case _ => throw new IllegalArgumentException(
      s"bad granularity '$spec' (expected size:timeUnit)")
  }

  /** dateTimeConvert(col, inputFormat, outputFormat, granularity):
    * parse → floor to granularity → emit in the output format.
    * Matches DateTimeConversionTransformFunction.java:37-75. */
  def dateTimeConvert(c: Column, inputFormat: String, outputFormat: String,
      granularity: String): Column = {
    val in = parseFormat(inputFormat)
    val out = parseFormat(outputFormat)
    val granMs = parseGranularityMillis(granularity)
    val ms = in.toMillis(c).cast("long")
    // floor-to-granularity entirely in long arithmetic (ms - ms mod g)
    val bucketed = ms - pmod(ms, lit(granMs))
    out.fromMillis(bucketed)
  }

  /** timeConvert(col, fromUnit, toUnit): epoch value unit→unit with
    * flooring division — TimeUnit.convert semantics
    * (TimeConversionTransformFunction.java:1-79). */
  def timeConvert(c: Column, fromUnit: String, toUnit: String): Column = {
    val ms = c.cast("long") * lit(unitMs(fromUnit))
    ((ms - pmod(ms, lit(unitMs(toUnit)))) / lit(unitMs(toUnit))).cast("long")
  }
}
