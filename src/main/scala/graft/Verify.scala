package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg (local iteration only — the driver passes two):
    // comma-separated name prefixes; dump + oracle only matching queries
    val keep: String => Boolean = args.lift(2) match {
      case Some(filter) =>
        val prefixes = filter.split(",").toSeq
        name => prefixes.exists(name.startsWith)
      case None => _ => true
    }
    val spark = GraftSession.build("graft-verify")
    new java.io.File(outDir).mkdirs()
    // A failed dump silently drops the query from the driver's gate
    // (happened rounds 10-11: a testdata schema change broke 17 queries
    // at analysis time and the gate shrank 104->87 with no signal).
    // Collect failures into a manifest + loud summary so shrinkage is
    // visible in driver logs and to GateCompletenessSpec.
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        Checkpoints.release(df) // free checkpoint-backed blocks per query
      }
      catch { case e: Throwable =>
        failures(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    if (failures.nonEmpty)
      System.err.println(s"[verify] GATE SHRINKAGE: ${failures.size} of " +
        s"${SparkEntry.queries.size} queries failed to dump and will be " +
        s"MISSING from the correctness gate: ${failures.keys.mkString(", ")}")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val failJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_failures.json"), failJson)
    spark.stop()
  }
}
