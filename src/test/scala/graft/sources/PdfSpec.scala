package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Media.MediaRecord

/** PDF text extraction (sources.Pdf; q220 gates the encode → extract
  * round trip end-to-end): the committed python-built fixture pins
  * the parser against an independent writer, the raw/Flate
  * differential pins that compression changes nothing, and the
  * out-of-scope inputs surface as error rows / skip counts — never
  * silent garbage, never a task failure.
  */
class PdfSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/fixtures/$name")
    assert(in != null, s"missing committed fixture $name")
    try in.readAllBytes() finally in.close()
  }

  test("sample.pdf: python-written fixture pins escapes, octal, nested parens, comments, hex + quote shows") {
    val x = Pdf.extractText(fixture("sample.pdf")).toOption.get
    assert((x.nStreams, x.nFlate, x.nRaw, x.nSkipped, x.nShows) ===
      ((2, 1, 1, 0, 5)))
    // <48 65\n78 21 4> is a whitespace-split ODD-count hex literal:
    // "Hex!" plus the padded low-nibble byte 0x40 = '@'
    assert(x.text ===
      "Fixture (one): back\\slashab cdefHex!@octAl (nested) keepqq")
  }

  test("raw and FlateDecode streams of the same content extract identically") {
    val texts = Seq("plain words here", "with (parens) and \\ slash",
      "spaces  keep   exactly", "x" * 100)
    for (t <- texts) {
      val raw = Pdf.extractText(Pdf.buildPdf("T|", t, flate = false)).toOption.get
      val fl = Pdf.extractText(Pdf.buildPdf("T|", t, flate = true)).toOption.get
      assert(raw.text === s"T|$t~fin.", s"text=$t")
      assert(fl.text === raw.text, s"text=$t")
      assert((raw.nShows, fl.nShows) === ((4, 4)))
      assert(raw.nRaw === 1 && fl.nFlate === 1)
    }
  }

  test("indirect /Length falls back to the endstream scan") {
    // hand-built object with /Length as an indirect reference
    val pdf = ("%PDF-1.4\n" +
      "4 0 obj\n<< /Length 6 0 R >>\nstream\n" +
      "BT (indirect ok) Tj ET" +
      "\nendstream\nendobj\n%%EOF\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val x = Pdf.extractText(pdf).toOption.get
    assert(x.text === "indirect ok")
    assert(x.nStreams === 1 && x.nRaw === 1)
  }

  test("out-of-scope documents: encrypted -> Left; foreign filter -> skipped, extraction continues") {
    assert(Pdf.extractText("nope".getBytes).isLeft)
    val enc = ("%PDF-1.4\ntrailer\n<< /Encrypt 9 0 R >>\n%%EOF\n").getBytes
    assert(Pdf.extractText(enc).left.exists(_.contains("encrypted")))
    // one DCTDecode stream (skipped) + one raw text stream (extracted)
    val mixed = ("%PDF-1.4\n" +
      "4 0 obj\n<< /Length 4 /Filter /DCTDecode >>\nstream\nÿØÿà\nendstream\nendobj\n" +
      "6 0 obj\n<< /Length 22 >>\nstream\nBT (still works) Tj ET\nendstream\nendobj\n" +
      "%%EOF\n").getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val x = Pdf.extractText(mixed).toOption.get
    assert(x.nSkipped === 1 && x.nRaw === 1)
    assert(x.text === "still works")
    // corrupt flate body: skipped, not fatal
    val badFlate = ("%PDF-1.4\n" +
      "4 0 obj\n<< /Length 8 /Filter /FlateDecode >>\nstream\nnotzlib!\nendstream\nendobj\n%%EOF\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val y = Pdf.extractText(badFlate).toOption.get
    assert(y.nSkipped === 1 && y.text === "")
  }

  test("extractRows: corrupt records become error rows in the channel, not task failures") {
    val media = Seq(
      MediaRecord(1L, "doc", "pdf", Pdf.buildPdf("A|", "first doc", flate = true)),
      MediaRecord(2L, "doc", "pdf", "not a pdf at all".getBytes),
      MediaRecord(3L, "doc", "pdf", Pdf.buildPdf("C|", "third doc", flate = false)))
      .toDS()
    val rows = Pdf.extractRows(media).collect().sortBy(_.media_id)
    assert(rows.map(_.ok).toSeq === Seq(true, false, true))
    assert(rows(0).text === "A|first doc~fin.")
    assert(rows(1).err.contains("%PDF-"))
    assert(rows(2).text === "C|third doc~fin.")
  }
}
