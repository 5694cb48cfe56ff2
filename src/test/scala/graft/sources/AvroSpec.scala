package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Avro container reader pinned two ways: Scala round trips through
  * [[Avro.avroBytes]] (an independent write path) and the committed
  * python fixture (5 primitive types, deflate, a NEGATIVE-count
  * metadata map block, multi-record blocks). Plus the malformed-input
  * discipline and the named out-of-scope Lefts.
  */
class AvroSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/fixtures/$name")
    try in.readAllBytes()
    finally in.close()
  }

  test("round trip: multi-block, both codecs, zigzag edge values") {
    for (deflate <- Seq(false, true)) {
      val recs = Seq((0L, 0, ""), (-1L, -64, "neg zigzag"),
        (Long.MaxValue, Int.MaxValue, "big"), (42L, 7, "plain text"))
      val f = Avro.read(Avro.avroBytes(recs, deflate, syncSeed = 9L)).toOption.get
      assert(f.schemaName === "doc_part")
      assert(f.codec === (if (deflate) "deflate" else "null"))
      assert((f.nBlocks, f.nRecords) === ((4, 4L)))
      assert(f.records.map(r => (r.fields("id"), r.fields("seq"), r.fields("part"))) ===
        recs.map(r => (r._1.toString, r._2.toString, r._3)))
    }
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
    val good = Avro.avroBytes(Seq((1L, 0, "x"), (2L, 1, "y")), deflate = true, syncSeed = 3L)
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
    val neg = Avro.avroBytes(Seq((1L, 0, "x")), deflate = false, syncSeed = 3L)
    // last 16 bytes = sync, then 'x', then its length varint
    neg(neg.length - 18) = 0x01
    assert(Avro.read(neg).left.toOption.get.contains("negative"))
  }
}
