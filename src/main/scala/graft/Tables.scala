package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    // events.ts arrives as epoch-nanos long (nanosAsLong, GraftSession);
    // truncate to microsecond TimestampType — same truncation DuckDB
    // applies when it reads TIMESTAMP(NANOS) into its micro timestamps.
    if (name == "events")
      // integral `div`, NOT `/` (which is double division and loses
      // precision on 19-digit epoch-nanos)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
