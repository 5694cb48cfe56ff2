package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Archive readers pinned two ways: Scala round trips (zipBytes /
  * tarBytes are independent write paths, not shared parse code) and
  * committed fixtures from python's zipfile/tarfile — a SECOND
  * independent implementation, the gen_image_fixtures.py discipline
  * (scripts/gen_archive_fixtures.py). Plus the malformed-input rule:
  * Left, never a throw.
  */
class ArchiveSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/fixtures/$name")
    try in.readAllBytes()
    finally in.close()
  }

  private val alpha = ("the quick brown fox jumps over the lazy dog " * 8)
    .getBytes("US-ASCII")
  private val beta = ("row " * 100).getBytes("US-ASCII")
  private val gamma = (32 until 127).map(_.toChar).mkString * 3

  test("zip round trip: stored and deflated entries, sizes and CRC verified") {
    val data = Archive.zipBytes(Seq(
      ("a.txt", alpha, true),
      ("b/stored.bin", gamma.getBytes("US-ASCII"), false),
      ("empty.txt", Array.emptyByteArray, true)))
    assert(Archive.sniffZip(data))
    val entries = Archive.readZip(data).toOption.get
    assert(entries.map(_.entry_name) === Seq("a.txt", "b/stored.bin", "empty.txt"))
    assert(entries.map(_.method) === Seq("deflate", "stored", "deflate"))
    assert(entries(0).data.toSeq === alpha.toSeq)
    assert(new String(entries(1).data, "US-ASCII") === gamma)
    assert(entries(2).uncomp_size === 0L)
    assert(entries.forall(_.crc_ok))
    // deflate actually compressed the repetitive payload
    assert(entries(0).comp_size < entries(0).uncomp_size)
  }

  test("zip64 round trip: masked central records + EOCD64 resolve identically") {
    val entries = Seq(
      ("a.txt", alpha, true),
      ("b/stored.bin", gamma.getBytes("US-ASCII"), false))
    val classic = Archive.readZipDetailed(Archive.zipBytes(entries)).toOption.get
    val z64 = Archive.readZipDetailed(Archive.zipBytes(entries, zip64 = true)).toOption.get
    assert(!classic._1 && z64._1, "zip64 flag must reflect the framing")
    // same extracted entries through both framings
    assert(z64._2.map(e => (e.entry_name, e.method, e.uncomp_size, e.crc_ok)) ===
      classic._2.map(e => (e.entry_name, e.method, e.uncomp_size, e.crc_ok)))
    assert(z64._2(0).data.toSeq === alpha.toSeq)
    // malformed zip64: masked EOCD with the locator cut away
    val raw = Archive.zipBytes(entries, zip64 = true)
    val noLoc = raw.take(raw.length - 42) ++ raw.takeRight(22) // drop the locator
    assert(Archive.readZip(noLoc).left.toOption.get.contains("locator"))
    // every truncation point is a Left, never a throw
    for (cut <- 0 until raw.length)
      assert(Archive.readZip(raw.take(cut)).isLeft, s"zip64 cut=$cut")
  }

  test("python zip64 fixture: skipped 0x5455 extra, 0x0001 resolution, EOCD64") {
    val (z64, entries) = Archive.readZipDetailed(fixture("sample64.zip")).toOption.get
    assert(z64)
    assert(entries.map(_.entry_name) === Seq("a_stored.txt", "b_deflate.txt"))
    assert(entries.map(_.method) === Seq("stored", "deflate"))
    assert(new String(entries(0).data, "US-ASCII") === "stored entry payload")
    assert(new String(entries(1).data, "US-ASCII") ===
      "deflated entry payload, deflated entry payload")
    assert(entries.forall(_.crc_ok))
  }

  test("tar round trip: names, sizes, header checksums, block padding") {
    val data = Archive.tarBytes(Seq(
      ("alpha.txt", alpha),
      ("exact512.bin", new Array[Byte](512)), // no padding edge
      ("tiny", Array[Byte](65))))
    assert(Archive.sniffTar(data))
    val entries = Archive.readTar(data).toOption.get
    assert(entries.map(_.entry_name) === Seq("alpha.txt", "exact512.bin", "tiny"))
    assert(entries.map(_.uncomp_size) === Seq(alpha.length.toLong, 512L, 1L))
    assert(entries.forall(_.crc_ok))
    assert(entries(0).data.toSeq === alpha.toSeq)
  }

  test("GNU long-name tar: the L record applies to the NEXT entry only (r19)") {
    val entries = Archive.readTar(fixture("sample_longname.tar")).toOption.get
    assert(entries.map(_.entry_name) === Seq(
      "deeply/" + ("n" * 120) + "/payload_with_a_very_long_gnu_path.txt",
      "short.txt"))
    assert(new String(entries(0).data, "US-ASCII") === "long-name payload body")
    assert(new String(entries(1).data, "US-ASCII") === "short name after")
  }

  test("pax tar round trip: 'x' path/size overrides + 'g' global (r20)") {
    val longName = "pax/" + ("p" * 110) + "/payload.txt"
    val data = Archive.tarBytesPax(
      Seq((longName, alpha), ("second.txt", Array[Byte](66, 67))),
      global = Map("graft.round" -> "20"))
    assert(Archive.sniffTar(data))
    val entries = Archive.readTar(data).toOption.get
    assert(entries.map(_.entry_name) === Seq(longName, "second.txt"))
    assert(entries.map(_.method) === Seq("pax", "pax"))
    // the ustar size fields read 0 — the sizes came from pax records
    assert(entries.map(_.uncomp_size) === Seq(alpha.length.toLong, 2L))
    assert(entries(0).data.toSeq === alpha.toSeq)
    assert(entries.forall(_.crc_ok))
  }

  test("python tarfile PAX fixture: long path, forced size, 'x' consumed (r20)") {
    val entries = Archive.readTar(fixture("sample_pax.tar")).toOption.get
    assert(entries.map(_.entry_name) === Seq(
      "paxdir/" + ("q" * 115) + "/long.txt", "forced.txt", "plain.txt"))
    // forced.txt's ustar size field was hand-patched to 0 in the
    // fixture: only the pax `size` record recovers the 34 bytes
    assert(entries.map(_.uncomp_size) === Seq(21L, 34L, 18L))
    assert(new String(entries(1).data, "US-ASCII") ===
      "forced-size payload via pax record")
    assert(new String(entries(2).data, "US-ASCII") === "plain ustar member")
    // the leading members consumed their 'x' records; whether
    // plain.txt reads pax or ustar depends on whether python emitted
    // an 'x' for it — pin what the committed fixture actually carries
    assert(entries.take(2).map(_.method) === Seq("pax", "pax"))
    assert(entries.forall(_.crc_ok))
  }

  test("GNU base-256 size field: binary form recovers the exact bytes (r20)") {
    val entries = Archive.readTar(fixture("sample_base256.tar")).toOption.get
    assert(entries.map(e => (e.entry_name, e.uncomp_size)) ===
      Seq(("binary.txt", 22L)))
    assert(new String(entries.head.data, "US-ASCII") === "base-256 sized payload")
    // python's tarfile reads the same archive identically (pinned in
    // the generator); the checksum was recomputed over the patched
    // field, so crc_ok must hold
    assert(entries.head.crc_ok)
    // an overflowing base-256 field is a named Left, not a wrap
    val d = fixture("sample_base256.tar").clone()
    java.util.Arrays.fill(d, 124, 136, 0xff.toByte)
    d(124) = 0x80.toByte
    var sum = 0L
    for (i <- 0 until 512) sum += (if (i >= 148 && i < 156) ' '.toInt else d(i) & 0xff)
    val chk = f"$sum%06o".getBytes("US-ASCII")
    System.arraycopy(chk, 0, d, 148, 6); d(154) = 0; d(155) = ' '
    assert(Archive.readTar(d).left.toOption.get.contains("overflow"))
  }

  test("python zipfile fixture: deflate + stored + subdirectory + archive comment") {
    // the comment shifts EOCD off its no-comment offset: the backward
    // scan (not a fixed -22 read) must find it
    val entries = Archive.readZip(fixture("sample.zip")).toOption.get
    assert(entries.map(_.entry_name) === Seq("alpha.txt", "stored.txt", "sub/beta.txt"))
    assert(entries.map(_.method) === Seq("deflate", "stored", "deflate"))
    assert(entries(0).data.toSeq === alpha.toSeq)
    assert(new String(entries(1).data, "US-ASCII") === gamma)
    assert(entries(2).data.toSeq === beta.toSeq)
    assert(entries.forall(_.crc_ok))
  }

  test("python tarfile fixture: ustar regular files; directory entries skipped") {
    val entries = Archive.readTar(fixture("sample.tar")).toOption.get
    assert(entries.map(_.entry_name) === Seq("alpha.txt", "sub/gamma.bin"))
    assert(entries(0).data.toSeq === alpha.toSeq)
    assert(new String(entries(1).data, "US-ASCII") === gamma)
    assert(entries.forall(_.crc_ok))
  }

  test("a tampered zip payload fails CRC without failing the read") {
    val data = Archive.zipBytes(Seq(("a.txt", alpha, false)))
    // flip one STORED payload byte (local header is 30 + 5 name bytes)
    data(30 + 5 + 3) = (data(30 + 5 + 3) ^ 0x40).toByte
    val entries = Archive.readZip(data).toOption.get
    assert(!entries.head.crc_ok)
  }

  test("a tampered tar header fails its checksum") {
    val data = Archive.tarBytes(Seq(("alpha.txt", alpha)))
    data(0) = 'B' // rename in place: header checksum now stale
    val entries = Archive.readTar(data).toOption.get
    assert(!entries.head.crc_ok)
  }

  test("malformed input is a Left, never a throw") {
    val zip = Archive.zipBytes(Seq(("a.txt", alpha, true)))
    val tar = Archive.tarBytes(Seq(("a.txt", alpha)))
    // every truncation point of both containers
    for (cut <- 0 until zip.length)
      assert(Archive.readZip(zip.take(cut)).isLeft, s"zip cut=$cut")
    for (cut <- 1 until tar.length by 7)
      Archive.readTar(tar.take(cut)) // Left or partial Right, must not throw
    assert(Archive.readZip("PKgarbage".getBytes("US-ASCII")).isLeft)
    assert(Archive.readZip(Array.emptyByteArray).isLeft)
    // out-of-scope features are NAMED Lefts
    val enc = Archive.zipBytes(Seq(("a.txt", alpha, false)))
    // set the encryption bit in the central record: find PK\x01\x02
    var i = 0
    while (!(enc(i) == 'P' && enc(i + 1) == 'K' && enc(i + 2) == 1 && enc(i + 3) == 2)) i += 1
    enc(i + 8) = (enc(i + 8) | 1).toByte
    assert(Archive.readZip(enc).left.toOption.get.contains("encrypted"))
  }

  test("pax size record: overflow-range and non-ASCII-digit values are a Left (r21 advice)") {
    // hand-built tar (checksum validity is recorded, not enforced, so
    // a minimal header suffices): one pax 'x' header carrying only a
    // size record, then a 5-byte regular entry it binds to
    def rawHeader(name: String, size: Long, typeflag: Char): Array[Byte] = {
      val h = new Array[Byte](512)
      val nb = name.getBytes("US-ASCII")
      System.arraycopy(nb, 0, h, 0, nb.length)
      val sz = ("%011o".format(size) + " ").getBytes("US-ASCII")
      System.arraycopy(sz, 0, h, 124, sz.length)
      h(156) = typeflag.toByte
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      var s = 0L; h.foreach(b => s += b & 0xff)
      val cs = ("%06o".format(s) + "  ").getBytes("US-ASCII")
      System.arraycopy(cs, 0, h, 148, cs.length)
      h
    }
    def paxTar(sizeVal: String): Array[Byte] = {
      val tail = s" size=$sizeVal\n".getBytes("UTF-8")
      var l = tail.length + 1
      while (l.toString.length + tail.length != l)
        l = l.toString.length + tail.length
      val rec = l.toString.getBytes("US-ASCII") ++ tail
      val out = new java.io.ByteArrayOutputStream()
      out.write(rawHeader("pax_hdr", rec.length.toLong, 'x'))
      out.write(rec)
      out.write(new Array[Byte]((512 - rec.length % 512) % 512))
      val body = "hello".getBytes("US-ASCII")
      out.write(rawHeader("victim.txt", body.length.toLong, '0'))
      out.write(body)
      out.write(new Array[Byte](512 - body.length + 1024))
      out.toByteArray
    }
    // near-Long.MaxValue (dataStart + size used to overflow negative
    // past the EOF check) and >19-digit (toLong used to throw
    // NumberFormatException out of readTar): both named Lefts now
    assert(Archive.readTar(paxTar("9223372036854775807")).isLeft)
    assert(Archive.readTar(paxTar("999999999999999999999")).isLeft)
    // Unicode digits (Character.isDigit admits them; toLong throws)
    assert(Archive.readTar(paxTar("١٢٣")).isLeft)
    // a sane same-as-header override still round-trips
    val ok = Archive.readTar(paxTar("5")).toOption.get
    assert(new String(ok.head.data, "US-ASCII") === "hello")
    assert(ok.head.method === "pax")
  }
}
