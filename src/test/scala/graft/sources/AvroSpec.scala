package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Avro container reader pinned two ways: Scala round trips through
  * [[Avro.avroBytes]]/[[Avro.avroDocBytes]] (independent write
  * paths) and the committed python fixtures (5 primitive types,
  * deflate, a NEGATIVE-count metadata map block, multi-record
  * blocks; r19: snappy with literal AND overlapping-copy tags,
  * ["string","null"] union order, multi-block int arrays). Plus the
  * malformed-input discipline and the named out-of-scope Lefts.
  */
class AvroSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/fixtures/$name")
    try in.readAllBytes()
    finally in.close()
  }

  test("round trip: multi-block, all three codecs, zigzag edge values") {
    for (codec <- Seq("null", "deflate", "snappy")) {
      val recs = Seq((0L, 0, ""), (-1L, -64, "neg zigzag"),
        (Long.MaxValue, Int.MaxValue, "big"), (42L, 7, "plain text"))
      val f = Avro.read(Avro.avroBytes(recs, codec, syncSeed = 9L)).toOption.get
      assert(f.schemaName === "doc_part")
      assert(f.codec === codec)
      assert((f.nBlocks, f.nRecords) === ((4, 4L)))
      assert(f.records.map(r => (r.fields("id"), r.fields("seq"), r.fields("part"))) ===
        recs.map(r => (r._1.toString, r._2.toString, r._3)))
    }
  }

  test("nullable unions + arrays round trip in BOTH member orders") {
    for (nullFirst <- Seq(true, false); codec <- Seq("null", "snappy")) {
      val recs = Seq(
        Avro.DocRec(1L, Some("note one"), Seq(Seq(3, 4))),
        Avro.DocRec(2L, None, Seq(Seq(5), Seq(6))), // multi-block array
        Avro.DocRec(3L, Some(""), Seq())) // empty string != null; empty array
      val f = Avro.read(Avro.avroDocBytes(recs, nullFirst, codec, syncSeed = 4L))
        .toOption.get
      assert(f.schemaName === "doc_rec")
      val got = f.records.map(r =>
        (r.fields("id"), r.fields.get("note"), r.fields("tags")))
      assert(got === Seq(
        ("1", Some("note one"), "3,4"),
        ("2", None, "5,6"),
        ("3", Some(""), "")), s"nullFirst=$nullFirst codec=$codec")
    }
  }

  test("python fixture: snappy literal+copy tags, [string,null] union, int array") {
    val f = Avro.read(fixture("sample_nullable.avro")).toOption.get
    assert((f.schemaName, f.codec, f.nBlocks, f.nRecords) ===
      (("doc_rec", "snappy", 2, 3L)))
    val got = f.records.map(r =>
      (r.fields("id"), r.fields.get("note"), r.fields("tags")))
    assert(got === Seq(
      ("10", Some("hello"), "3,4"),
      ("11", None, "5"),
      ("12", Some("hehehe"), "")))
  }

  test("nested records flatten to dotted names in writer order (r19)") {
    for (codec <- Seq("null", "deflate", "snappy")) {
      val recs = Seq(
        Avro.NestedRec(1L, "en", 500, Some("a")),
        Avro.NestedRec(2L, "de", 0, None))
      val f = Avro.read(Avro.avroNestedBytes(recs, codec, syncSeed = 6L)).toOption.get
      assert(f.schemaName === "doc_nested")
      val got = f.records.map(r => (r.fields("id"), r.fields("meta.lang"),
        r.fields("meta.score"), r.fields.get("note")))
      assert(got === Seq(("1", "en", "500", Some("a")), ("2", "de", "0", None)),
        s"codec=$codec")
    }
  }

  test("python fixture: nested record schema, dotted flattened walk") {
    val f = Avro.read(fixture("sample_nested.avro")).toOption.get
    assert((f.schemaName, f.codec, f.nBlocks, f.nRecords) ===
      (("doc_nested", "deflate", 2, 3L)))
    val got = f.records.map(r => (r.fields("id"), r.fields("meta.lang"),
      r.fields("meta.score"), r.fields.get("note")))
    assert(got === Seq(
      ("7", "en", "950", Some("hello")),
      ("8", "de", "13", None),
      ("9", "fr", "0", Some("x"))))
  }

  test("map/enum/fixed round trip: multi-block maps, all codecs (r20)") {
    for (codec <- Seq("null", "deflate", "snappy")) {
      val recs = Seq(
        Avro.RichRec(5L, Seq(Seq("x" -> 7), Seq("y" -> 3)), 2,
          Array[Byte](1, 2, 3, 4)),
        Avro.RichRec(6L, Seq(Seq("a" -> 1, "b" -> 2)), 0,
          Array[Byte](-1, 0, 127, -128)),
        Avro.RichRec(7L, Seq.empty, 1, Array[Byte](0, 0, 0, 0)))
      val f = Avro.read(Avro.avroRichBytes(recs, codec, syncSeed = 3L)).toOption.get
      assert(f.schemaName === "doc_rich")
      assert(f.records.map(_.fields("attrs")) === Seq("x=7,y=3", "a=1,b=2", ""))
      assert(f.records.map(_.fields("color")) === Seq("blue", "red", "green"))
      assert(f.records.map(_.fields("sig")) ===
        Seq("01020304", "ff007f80", "00000000"))
    }
    // an enum index past the symbol table is a named Left
    val bad = Avro.avroRichBytes(Seq(
      Avro.RichRec(1L, Seq.empty, 9, Array[Byte](0, 0, 0, 0))), "null", 1L)
    assert(Avro.read(bad).left.toOption.get.contains("enum index"))
  }

  test("python fixture: map blocks incl. negative-count form, enum, fixed (r20)") {
    val f = Avro.read(fixture("sample_rich.avro")).toOption.get
    assert((f.schemaName, f.codec, f.nRecords) === (("rich_rec", "deflate", 3L)))
    assert(f.records.map(_.fields("id")) === Seq("20", "21", "22"))
    assert(f.records.map(_.fields("attrs")) === Seq("x=7,y=-3", "a=1,b=2", ""))
    assert(f.records.map(_.fields("color")) === Seq("blue", "red", "green"))
    assert(f.records.map(_.fields("sig")) ===
      Seq("010203040506", "aabbcc0011ff", "000000000000"))
  }

  test("out-of-scope schema shapes are named Lefts through the JSON parse") {
    // map of non-primitive values (maps of primitives are IN since r20)
    assert(Avro.parseSchema(
      """{"name":"m","fields":[{"name":"x","type":{"type":"map","values":{"type":"map","values":"long"}}}]}""")
      .left.toOption.get.contains("out of scope"))
    // fixed size out of range
    assert(Avro.parseSchema(
      """{"name":"f","fields":[{"name":"x","type":{"type":"fixed","name":"g","size":4096}}]}""")
      .left.toOption.get.contains("out of range"))
    // enum symbols carrying the reserved separator
    assert(Avro.parseSchema(
      """{"name":"e","fields":[{"name":"x","type":{"type":"enum","name":"c","symbols":["a|b"]}}]}""")
      .isLeft)
    // general (non-null) union
    assert(Avro.parseSchema(
      """{"name":"u","fields":[{"name":"x","type":["string","long"]}]}""")
      .left.toOption.get.contains("out of scope"))
    // array of records
    assert(Avro.parseSchema(
      """{"name":"a","fields":[{"name":"x","type":{"type":"array","items":{"type":"record"}}}]}""")
      .isLeft)
    // broken JSON never throws
    assert(Avro.parseSchema("""{"name": "x", "fields": [{{{""").isLeft)
  }

  test("snappy CRC tamper is a Left") {
    val good = Avro.avroBytes(Seq((1L, 0, "payload")), "snappy", syncSeed = 5L)
    val bad = good.clone()
    // flip a byte inside the block's CRC suffix (4 bytes before the
    // final 16-byte sync)
    bad(good.length - 18) = (bad(good.length - 18) ^ 0x40).toByte
    assert(Avro.read(bad).left.toOption.get.contains("CRC"))
  }

  test("python fixture: 5 primitive types, negative-count metadata, deflate") {
    val f = Avro.read(fixture("sample.avro")).toOption.get
    assert(f.schemaName === "pinned")
    assert((f.codec, f.nBlocks, f.nRecords) === (("deflate", 2, 3L)))
    val r1 = f.records(1).fields
    assert((r1("a"), r1("b"), r1("c"), r1("d"), r1("e")) ===
      (("1", "1", "rec1", "false", "0.5")))
    assert(f.records(2).fields("e") === "1.0")
    assert(f.records(0).fields("d") === "true")
  }

  test("malformed input is a Left, never a throw; out-of-scope named") {
    val good = Avro.avroBytes(Seq((1L, 0, "x"), (2L, 1, "y")), "deflate", syncSeed = 3L)
    // a cut at a block boundary is a valid shorter container — every
    // other cut must be a Left
    for (cut <- 0 until good.length)
      Avro.read(good.take(cut)) match {
        case Right(f) => assert(f.nRecords < 2, s"cut=$cut")
        case Left(_) => ()
      }
    assert(Avro.read("Objx".getBytes("US-ASCII")).isLeft)
    assert(Avro.read(Array.emptyByteArray).isLeft)
    // a tampered sync marker is caught
    val bad = good.clone()
    bad(good.length - 3) = (bad(good.length - 3) ^ 1).toByte
    assert(Avro.read(bad).left.toOption.get.contains("sync"))
    // a negative zigzag length (varint byte 0x01 = -1) must be a Left,
    // not an IllegalArgumentException from copyOfRange (r18 ADVICE)
    val neg = Avro.avroBytes(Seq((1L, 0, "x")), "null", syncSeed = 3L)
    // last 16 bytes = sync, then 'x', then its length varint
    neg(neg.length - 18) = 0x01
    assert(Avro.read(neg).left.toOption.get.contains("negative"))
  }
}
