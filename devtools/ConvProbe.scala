package graft

/** Scratch converter-throughput probe: StAX path vs fast path, at the
  * session's thread count (dev tool, not part of the library surface).
  */
object ConvProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("conv-probe")
    val convRows = 500000
    val chunks = 16
    val xmlDir = java.nio.file.Files.createTempDirectory("probe-changesets")
    (0 until chunks).foreach { c =>
      val xml = new StringBuilder(1 << 22)
      xml.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<osm version=\"0.6\">\n")
      var i = c * (convRows / chunks)
      val end = (c + 1) * (convRows / chunks)
      while (i < end) {
        val d = 1 + i % 28
        xml.append(s"""<changeset id="$i" created_at="2024-01-${f"$d%02d"}T10:30:00Z" """ +
          s"""closed_at="2024-01-${f"$d%02d"}T11:00:00Z" open="false" user="u${i % 997}" """ +
          s"""uid="${i % 997}" min_lat="${-89 + i % 178}.5" min_lon="${-179 + i % 358}.5" """ +
          s"""max_lat="${-88 + i % 178}.5" max_lon="${-178 + i % 358}.5" """ +
          s"""num_changes="${i % 500}" comments_count="${i % 7}">""" +
          s"""<tag k="comment" v="edit number $i"/></changeset>\n""")
        i += 1
      }
      xml.append("</osm>\n")
      java.nio.file.Files.writeString(xmlDir.resolve(f"chunk-$c%02d.osm"), xml.toString)
    }
    for (fast <- Seq(false, true); trial <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.changesets.ChangesetConverter.parse(
        spark, xmlDir.toString,
        graft.changesets.ChangesetConverter.Options(fastParser = fast)).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] parse-only fast=$fast trial=$trial rows=$n sec=$sec%.2f rows/s=${n / sec}%.0f")
    }
    for (fast <- Seq(false, true); trial <- 1 to 2) {
      val out = java.nio.file.Files.createTempDirectory("probe-conv").toString + "/out.parquet"
      val t0 = System.nanoTime()
      val n = graft.changesets.ChangesetConverter.convert(
        spark, xmlDir.toString, out,
        graft.changesets.ChangesetConverter.Options(fastParser = fast))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] convert    fast=$fast trial=$trial rows=$n sec=$sec%.2f rows/s=${n / sec}%.0f")
    }
    spark.stop()
  }
}
