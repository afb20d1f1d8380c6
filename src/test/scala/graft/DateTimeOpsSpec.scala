package graft

import org.apache.spark.sql.functions._
import graft.functions.DateTimeOps

class DateTimeOpsSpec extends SparkSpec {
  import spark.implicits._

  // 2024-06-01 12:34:56.789 UTC
  private val ms = 1717245296789L

  test("dateTimeConvert epoch→epoch with granularity bucketing") {
    val df = Seq(ms).toDF("ms")
    val r = df.select(
      DateTimeOps.dateTimeConvert($"ms", "1:MILLISECONDS:EPOCH",
        "15:MINUTES:EPOCH", "15:MINUTES").as("ep15"),
      DateTimeOps.dateTimeConvert($"ms", "1:MILLISECONDS:EPOCH",
        "1:MILLISECONDS:EPOCH", "1:DAYS").as("day_ms"))
      .as[(Long, Long)].head()
    assert(r._1 === ms / 900000L)         // floored 15-min bucket index
    assert(r._2 === (ms / 86400000L) * 86400000L) // day floor, millis out
  }

  test("dateTimeConvert epoch→SDF and SDF→epoch round-trip") {
    val df = Seq(ms).toDF("ms")
    val sdf = df.select(DateTimeOps.dateTimeConvert($"ms",
      "1:MILLISECONDS:EPOCH", "1:HOURS:SIMPLE_DATE_FORMAT:yyyy-MM-dd HH",
      "1:HOURS")).as[String].head()
    assert(sdf === "2024-06-01 12")
    val back = Seq(sdf).toDF("s").select(DateTimeOps.dateTimeConvert($"s",
      "1:HOURS:SIMPLE_DATE_FORMAT:yyyy-MM-dd HH", "1:HOURS:EPOCH", "1:HOURS"))
      .as[Long].head()
    assert(back === ms / 3600000L)
  }

  test("SDF patterns with sub-second fields keep millisecond precision") {
    // reference DateTimeFormatSpec parses SDF to full millis; a
    // unix_timestamp-based path would truncate the .789
    val got = Seq("2024-06-01 12:30:45.789").toDF("s")
      .select(DateTimeOps.parseFormat(
        "1:MILLISECONDS:SIMPLE_DATE_FORMAT:yyyy-MM-dd HH:mm:ss.SSS").toMillis($"s"))
      .as[Long].head()
    assert(got % 1000L === 789L, s"millis lost: $got")
  }

  test("timeConvert floors across units both directions") {
    val df = Seq((ms, ms / 1000L)).toDF("ms", "s")
    val r = df.select(
      DateTimeOps.timeConvert($"ms", "MILLISECONDS", "DAYS").as("d"),
      DateTimeOps.timeConvert($"s", "SECONDS", "MINUTES").as("m"),
      DateTimeOps.timeConvert(lit(3L), "HOURS", "SECONDS").as("hs"))
      .as[(Long, Long, Long)].head()
    assert(r._1 === ms / 86400000L)
    assert(r._2 === ms / 60000L)
    assert(r._3 === 3L * 3600L)
  }

  test("malformed specs fail at construction with a clear message") {
    intercept[IllegalArgumentException](DateTimeOps.parseFormat("1:FORTNIGHTS:EPOCH"))
    intercept[IllegalArgumentException](DateTimeOps.parseFormat("MILLISECONDS:EPOCH"))
    intercept[IllegalArgumentException](DateTimeOps.parseGranularityMillis("15"))
    intercept[IllegalArgumentException](DateTimeOps.parseFormat("0:HOURS:EPOCH"))
  }
}
