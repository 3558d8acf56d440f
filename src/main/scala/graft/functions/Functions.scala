package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function surface (reference §2.10) as Column combinators — all
  * codegen'd built-ins, no UDFs. */
object Functions {

  /** ms-since-epoch encode/decode — the reference's `timestamp=true` Avro
    * prop convention (utilities/SchemaUtil.java:160-200). Spark has native
    * TimestampType, so encode/decode are just unix_millis/timestamp_millis. */
  def timestampToMillis(c: Column): Column = unix_millis(c)
  def millisToTimestamp(c: Column): Column = timestamp_millis(c)

  /** µs padding for sink write timestamps (utilities/TimeUnitUtil.java). */
  def millisToMicros(c: Column): Column = c * lit(1000L)

  /** UTC yyyy-MM-dd parse (utilities/DateUtil.java). */
  def parseUtcDate(c: Column): Column = to_date(c, "yyyy-MM-dd")

  /** Hex rendering of binary (common/data/BinaryRawData.java:30-33). */
  def hexify(c: Column): Column = hex(c)

  /** key=value;... map serde (utilities/MapUtil.java). */
  def mapToString(c: Column): Column =
    concat_ws(";", transform(map_entries(c), e =>
      concat(e.getField("key"), lit("="), e.getField("value"))))
  def stringToMap(c: Column): Column = str_to_map(c, lit(";"), lit("="))

  /** CSV line build (FileSinkDataCSVConverter.java:99-123) — for the query
    * surface; actual CSV files go through the csv datasource. */
  def csvLine(cols: Seq[Column], sep: String = ","): Column =
    concat_ws(sep, cols: _*)

  /** JSON object build (FileSinkDataJSONConverter.java:111-130). */
  def jsonObject(cols: Column*): Column = to_json(struct(cols: _*))

  /** Exact decimal sum of a double expression: casts each value to
    * DECIMAL(18, scale) so partial/merge aggregation is exact integer
    * arithmetic — deterministic across engines, partitionings, and AQE
    * re-plans (double summation is order-dependent; at 1000 executors the
    * order is never the same twice). Final cast back to double. */
  def decimalSum(c: Column, scale: Int = 4): Column =
    sum(c.cast(s"decimal(27,$scale)")).cast("double")

  /** Exact-sum average: double division of an exact decimal sum by the
    * count — a single IEEE op on identical inputs, so deterministic. */
  def decimalAvg(c: Column, scale: Int = 4): Column =
    sum(c.cast(s"decimal(27,$scale)")).cast("double") / count(c).cast("double")
}
