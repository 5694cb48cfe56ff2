package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-first readers/writers for the lake formats beyond parquet
  * (the reference's world is XML-in/parquet-out; a general engine also
  * exchanges CSV and JSON lines with the outside).
  *
  * Discipline: schemas are always EXPLICIT. Inference reads the data
  * twice, guesses types from a sample, and produces different schemas
  * on different days — all three are unacceptable at 100 TB. FAILFAST
  * by default so schema drift surfaces at read time, not as nulls three
  * jobs later; permissive mode (with a corrupt-record column) is the
  * deliberate opt-in, mirroring the converter's two-tier error
  * contract (ChangesetConverter scaladoc).
  */
object Formats {

  val CorruptCol = "_corrupt_record"

  def readCsv(
      spark: SparkSession,
      path: String,
      schema: StructType,
      header: Boolean = true,
      permissive: Boolean = false): DataFrame = {
    val base = spark.read
      .option("header", header.toString)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
      // roundtrip-exact null/empty discipline (see writeCsv): \N is
      // null, quoted-empty is the empty string — without the pin Spark
      // reads both back as null and a writeCsv→readCsv cycle silently
      // conflates them. multiLine so quoted embedded newlines survive;
      // multiLine parsing is per-file, which is fine because writeCsv
      // emits one file per partition — the parallelism is the file
      // count, not intra-file splits.
      .option("nullValue", "\\N")
      .option("emptyValue", "")
      .option("multiLine", "true")
    val withMode =
      if (permissive)
        base.schema(withCorrupt(schema)).option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", CorruptCol)
      else base.schema(schema).option("mode", "FAILFAST")
    withMode.csv(path)
  }

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite")
      .option("header", header.toString)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
      // null → \N on disk (emptyValue stays the default quoted ""), so
      // the readCsv pin above can tell null from empty string — CSV's
      // classic lossy corner, closed at both ends of the roundtrip
      .option("nullValue", "\\N")
      .csv(path)

  def readJsonLines(
      spark: SparkSession,
      path: String,
      schema: StructType,
      permissive: Boolean = false): DataFrame = {
    val base = spark.read
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
    val withMode =
      if (permissive)
        base.schema(withCorrupt(schema)).option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", CorruptCol)
      else base.schema(schema).option("mode", "FAILFAST")
    withMode.json(path)
  }

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
      .json(path)

  /** ORC: self-describing columnar like parquet (no corrupt-record
    * mode to configure — malformed files fail the read). Schema is
    * still passed explicitly and ENFORCED: a silent evolution in the
    * files surfaces as an analysis error, not as drifting columns.
    */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "snappy").orc(path)

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else schema.add(CorruptCol, org.apache.spark.sql.types.StringType, nullable = true)
}
