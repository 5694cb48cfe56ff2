package graft.changesets

import java.nio.file.Files
import java.sql.Timestamp

import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based round-trip (SURVEY.md §5.2): random Changeset values
  * rendered to XML must convert back to exactly themselves. Covers the
  * attribute/entity/timestamp/nullability space the golden fixtures
  * sample point-wise. Generators driven directly with fixed seeds
  * (the scalatest-scalacheck bridge isn't in the offline cache, and
  * fixed seeds make failures reproducible anyway).
  */
class ChangesetRoundTripSpec extends SparkSpec {

  private val genUser: Gen[Option[String]] = Gen.option(Gen.oneOf(
    "alice", "bob w space", "goßmann", "quote\"user", "a&b<c>", "日本語"))

  private val genTs: Gen[Option[Timestamp]] = Gen.option(
    Gen.choose(946684800000L, 1893456000000L).map(new Timestamp(_))) // 2000..2030

  private val genChangeset: Gen[Changeset] = for {
    id <- Gen.choose(1L, Long.MaxValue / 2)
    created <- genTs
    closed <- genTs
    open <- Arbitrary.arbitrary[Boolean]
    user <- genUser
    uid <- Gen.option(Gen.choose(0L, Int.MaxValue.toLong))
    minLat <- Gen.option(Gen.choose(-90.0, 90.0))
    minLon <- Gen.option(Gen.choose(-180.0, 180.0))
    maxLat <- Gen.option(Gen.choose(-90.0, 90.0))
    maxLon <- Gen.option(Gen.choose(-180.0, 180.0))
    numChanges <- Gen.choose(0L, 4294967295L) // u32 range
    comments <- Gen.choose(0L, 1000L)
    desc <- Gen.option(Gen.oneOf(
      "simple", "with & entity", "with <angle> brackets", "unicode ✓ édit", ""))
  } yield Changeset(id, created, closed, open, user, uid,
    minLat, minLon, maxLat, maxLon, numChanges, comments, desc)

  private def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    .replace("\"", "&quot;")

  private def fmtTs(t: Timestamp): String =
    java.time.Instant.ofEpochMilli(t.getTime).toString

  private def render(cs: Seq[Changeset]): String = {
    val items = cs.map { c =>
      val attrs = Seq(
        Some(s"""id="${c.id}""""),
        c.created_at.map(t => s"""created_at="${fmtTs(t)}""""),
        c.closed_at.map(t => s"""closed_at="${fmtTs(t)}""""),
        Some(s"""open="${c.open}""""),
        c.user.map(u => s"""user="${esc(u)}""""),
        c.uid.map(u => s"""uid="$u""""),
        c.min_lat.map(v => s"""min_lat="$v""""),
        c.min_lon.map(v => s"""min_lon="$v""""),
        c.max_lat.map(v => s"""max_lat="$v""""),
        c.max_lon.map(v => s"""max_lon="$v""""),
        Some(s"""num_changes="${c.num_changes}""""),
        Some(s"""comments_count="${c.comments_count}"""")).flatten.mkString(" ")
      c.description match {
        case Some(d) =>
          s"""<changeset $attrs>\n  <tag k="comment" v="${esc(d)}"/>\n</changeset>"""
        case None => s"<changeset $attrs/>"
      }
    }
    s"""<?xml version="1.0" encoding="UTF-8"?>\n<osm version="0.6">\n${items.mkString("\n")}\n</osm>"""
  }

  test("random changesets survive XML -> parquet round trip exactly") {
    import spark.implicits._
    val gen = Gen.listOfN(8, genChangeset)
    (1 to 15).foreach { i =>
      val batch = gen.apply(Gen.Parameters.default, Seed(42L + i))
        .getOrElse(fail(s"generator exhausted at iteration $i"))
      // unique ids so sort-and-compare is stable
      val cs = batch.zipWithIndex.map { case (c, idx) => c.copy(id = idx + 1L) }
      val f = Files.createTempFile("prop", ".osm")
      Files.writeString(f, render(cs))
      val got = ChangesetConverter.parse(spark, f.toString,
        ChangesetConverter.Options()).as[Changeset].collect().sortBy(_.id).toList
      // ms-truncated timestamps: the schema stores epoch millis
      assert(got === cs.sortBy(_.id), s"round-trip mismatch at seed ${42L + i}")
      Files.deleteIfExists(f)
    }
  }
}
