package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  * One parquet file per table under `sfDir`. Plain `spark.read.parquet`
  * keeps the scan declarative so Catalyst pushes filters/projections
  * into the parquet reader (verify via PushedFilters in explain).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** Normalize `events.ts` to session-zoned microsecond TimestampType,
    * adapting to whichever physical type the testdata was generated with.
    * The testdata convention has changed across driver rounds:
    *   - TIMESTAMP(NANOS): Spark's vectorized reader surfaces it as
    *     epoch-nanos LongType under `spark.sql.legacy.parquet.nanosAsLong`
    *     (GraftSession) — integral `div 1000` (NOT `/`, double division
    *     loses precision on 19-digit nanos) matches DuckDB's truncation.
    *   - TIMESTAMP_MICROS (isAdjustedToUTC=false): reads as TIMESTAMP_NTZ;
    *     cast to TimestampType is value-preserving because the session
    *     timezone is pinned to UTC (GraftSession) and DuckDB compares the
    *     same naive micros.
    *   - TIMESTAMP_MICROS (adjusted): already TimestampType — identity.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other; expected nanos LongType, TIMESTAMP_NTZ, or TIMESTAMP")
    }
}
