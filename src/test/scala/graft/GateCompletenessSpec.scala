package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import scala.util.{Failure, Success, Try}

/** Gate-completeness guard (round 12, after the r10/r11 blindspot).
  *
  * Background: the driver's correctness gate only compares queries whose
  * Verify dump succeeded — a query that fails ANALYSIS against the live
  * testdata schema silently vanishes from CORRECTNESS_r{N}.json. Rounds
  * 10–11 ran with 87 checked rows (r9 had 101) and nothing noticed,
  * because no assertion diffs the checked-key set against
  * `SparkEntry.queries`. These tests make that failure mode loud:
  *
  *  1. Every registered query must ANALYZE against the real testdata at
  *     `/root/testdata/sf0.001` (production schemas, incl. whatever
  *     physical timestamp convention the driver last generated). One
  *     aggregated test failing with the FULL broken-key list — not N
  *     scattered failures — so a schema-convention change reads as one
  *     actionable diff.
  *  2. The latest CORRECTNESS_r*.json key set is diffed against the
  *     oracle-backed registry. A key that is missing from the last gate
  *     AND fails to analyze locally is exactly the silent-shrinkage bug;
  *     a key that is missing but analyzes fine is new-this-round (or
  *     just fixed) and only reported, not failed.
  */
class GateCompletenessSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def analysisFailures: Map[String, String] =
    SparkEntry.queries.flatMap { case (name, fn) =>
      Try(fn(spark, sfDir).schema) match {
        case Success(_) => None
        case Failure(e) => Some(name -> e.getMessage.linesIterator.take(2).mkString(" "))
      }
    }

  test("every registered query analyzes against the production testdata schema") {
    assume(Files.exists(Paths.get(sfDir)), s"$sfDir not present")
    val broken = analysisFailures
    assert(broken.isEmpty,
      s"\n${broken.size} queries fail analysis against $sfDir — these will " +
        s"SILENTLY drop out of the driver's correctness gate:\n" +
        broken.toSeq.sortBy(_._1).map { case (k, m) => s"  $k: $m" }.mkString("\n"))
  }

  test("latest CORRECTNESS gate covers every oracle-backed query (no silent shrinkage)") {
    assume(Files.exists(Paths.get(sfDir)), s"$sfDir not present")
    val latest = Files.list(Paths.get("/root/repo")).iterator.asScala
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("CORRECTNESS_r") && n.endsWith(".json"))
      .toSeq.sortBy(n => n.stripPrefix("CORRECTNESS_r").stripSuffix(".json").toInt)
      .lastOption
    assume(latest.nonEmpty, "no CORRECTNESS_r*.json yet (round 1)")

    val text = Files.readString(Paths.get(s"/root/repo/${latest.get}"))
    // keys are top-level "qNN_name": { — a flat object, so any quoted
    // string followed by ": {" at nesting depth 1 is a key; the simple
    // regex is safe because query keys never contain quotes/braces.
    val gated = "\"(q[0-9]+[A-Za-z0-9_]*)\"\\s*:\\s*\\{".r
      .findAllMatchIn(text).map(_.group(1)).toSet
    val registered = SparkEntry.oracleSql.keySet
    val missing = registered -- gated
    if (missing.nonEmpty) {
      val broken = analysisFailures.keySet
      val silentlyDropped = missing.intersect(broken)
      info(s"${latest.get}: ${gated.size} gated / ${registered.size} registered; " +
        s"missing-from-gate: ${missing.toSeq.sorted.mkString(", ")} " +
        "(keys that analyze locally are new-this-round or freshly fixed)")
      assert(silentlyDropped.isEmpty,
        s"\nqueries missing from ${latest.get} AND broken against $sfDir " +
          s"(the r10/r11 silent-shrinkage bug): ${silentlyDropped.toSeq.sorted.mkString(", ")}")
    }
  }
}
