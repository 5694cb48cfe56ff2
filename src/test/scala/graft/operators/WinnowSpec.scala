package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Winnowing fingerprints (Schleimer et al. 2003) pinned three ways:
  * a driver-side reference implementation (plain Scala sliding
  * windows over the same Karp-Rabin polynomial hash — independently
  * re-folded here, so it also differentially pins the codegen'd
  * PolyHash expression) must agree exactly; the paper's detection
  * guarantee (shared run >= w+k-1 tokens -> shared fingerprint) must
  * hold on adversarial doc pairs; and the df cap must keep hot
  * fingerprints out of the pair join.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala re-fold of graft.functions.PolyHash's contract: left
    * fold over Unicode CODE POINTS (the DuckDB `unicode(c)` mirror).
    */
  private def polyRef(s: String): Long = {
    var h = 0L
    s.codePoints().forEach(cp => h = (h * 1000003L + cp) % 2147483647L)
    h
  }

  test("poly_hash folds code points — exact on non-ASCII too (the oracle mirror)") {
    val samples = Seq("", "a", "abc 12", "café", "漢字 ok",
      "mixed café 漢字 🚀 tail")
    val got = samples.toDF("s")
      .select(graft.functions.TextFunctions.polyHash(col("s")))
      .collect().map(_.getLong(0)).toSeq
    assert(got === samples.map(polyRef))
    // and the SQL surface sees the same function (GraftExtensions /
    // VectorExpressions.register both inject it)
    graft.functions.VectorExpressions.register(spark)
    assert(spark.sql("SELECT poly_hash('abc 12')").collect()(0).getLong(0)
      === polyRef("abc 12"))
  }

  test("poly_hash on malformed UTF-8 is deterministic and in-bounds (no Unsafe overread)") {
    import org.apache.spark.unsafe.types.UTF8String
    // truncated lead bytes at the buffer end: 2-, 3-, 4-byte leads with
    // the continuation bytes missing; plus a mid-string truncated pair
    val cases = Seq(
      Array(0xc3.toByte),                               // 2-byte lead, nothing after
      Array('a'.toByte, 0xe4.toByte),                   // 3-byte lead, nothing after
      Array('a'.toByte, 0xf0.toByte),                   // 4-byte lead, nothing after
      Array(0xe4.toByte, 0xb8.toByte),                  // 3-byte lead, one of two
      Array(0xf0.toByte, 0x9f.toByte, 0x9a.toByte))     // 4-byte lead, two of three
    // contract: a sequence that would run past numBytes folds as its
    // raw lead byte — so the value is computable by the same fold
    def ref(bytes: Array[Byte]): Long = {
      var h = 0L; var i = 0; val n = bytes.length
      while (i < n) {
        val b0 = bytes(i) & 0xff
        val len = if (b0 < 0x80) 1 else if (b0 < 0xe0) 2 else if (b0 < 0xf0) 3 else 4
        val cp = if (len == 1 || i + len > n) { i += 1; b0 }
          else { // decode normally (valid-prefix case not exercised here)
            var c = b0 & (0x7f >> len); var j = 1
            while (j < len) { c = (c << 6) | (bytes(i + j) & 0x3f); j += 1 }
            i += len; c
          }
        h = (h * 1000003L + cp) % 2147483647L
      }
      h
    }
    cases.foreach { bytes =>
      val s = UTF8String.fromBytes(bytes)
      val h1 = graft.functions.PolyHash.hash(s)
      val h2 = graft.functions.PolyHash.hash(s)
      assert(h1 === h2, "must be deterministic")
      assert(h1 >= 0 && h1 < 2147483647L)
      assert(h1 === ref(bytes), s"bytes ${bytes.map(b => f"${b & 0xff}%02x").mkString(" ")}")
    }
    // and valid UTF-8 is unaffected by the bounds checks
    assert(graft.functions.PolyHash.hash(UTF8String.fromString("café 漢字"))
      === polyRef("café 漢字"))
  }

  /** Independent reference: same tokenization, per-token hash, Horner
    * gram combination, and window-min selection as
    * Dedup.winnowFingerprints, via Scala collections.
    */
  private def refFps(text: String, k: Int, w: Int): Set[Long] = {
    val P = 2147483647L
    val HB = 1000003L
    val ths = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq.map(polyRef)
    def horner(g: Seq[Long]): Long = g.foldLeft(0L)((acc, x) => (acc * HB + x) % P)
    val hs =
      if (ths.size >= k) ths.sliding(k).map(horner).toVector
      else Vector(horner(ths))
    if (hs.size >= w) hs.sliding(w).map(_.min).toSet else Set(hs.min)
  }

  private def sparkFps(docs: Seq[(Long, String)], k: Int, w: Int): Map[Long, Set[Long]] =
    Dedup.winnowFingerprints(docs.toDF("doc_id", "text"), "doc_id", "text", k, w)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap

  test("fingerprints match the driver-side reference on varied docs") {
    val docs = Seq[(Long, String)](
      1L -> "the quick brown fox jumps over the lazy dog again and again until done",
      2L -> "a b c d e f g h i j k l m n o p q r s t",
      3L -> "short doc",            // < k tokens: whole doc one gram
      4L -> "one two three four",   // k grams < w: global min only
      5L -> "Repetition repetition repetition repetition repetition repetition",
      6L -> "Punctuation, splits; tokens! and CASE is folded: OK?",
      // non-ASCII flows through the SAME fold (code points) — the
      // tokenizer strips [^a-z0-9], so accents/CJK split tokens but the
      // surviving ASCII runs must fingerprint identically to the
      // reference; 7 keeps real multi-window structure around them
      7L -> "café naïve 漢字 tokens stay stable across the whole winnow window run here")
    for ((k, w) <- Seq((3, 4), (2, 5), (3, 2))) {
      val got = sparkFps(docs, k, w)
      docs.foreach { case (id, text) =>
        assert(got(id) === refFps(text, k, w), s"doc $id k=$k w=$w")
      }
    }
  }

  test("winnowing guarantee: a shared run of w+k-1 tokens yields a shared fingerprint") {
    // k=3, w=4 -> any shared 6-token run must share a fingerprint.
    val run = "alpha bravo charlie delta echo foxtrot"
    val docs = Seq[(Long, String)](
      1L -> s"unrelated prefix words here $run and then a different tail entirely",
      2L -> s"$run with another continuation that shares nothing else at all",
      3L -> "completely disjoint vocabulary sentence with no overlap whatsoever")
    val fps = sparkFps(docs, 3, 4)
    assert((fps(1L) intersect fps(2L)).nonEmpty)
    assert((fps(1L) intersect fps(3L)).isEmpty)
    assert((fps(2L) intersect fps(3L)).isEmpty)
  }

  test("density: long docs keep far fewer fingerprints than grams") {
    val toks = (0 until 400).map(i => s"tok${i % 97}x$i")
    val docs = Seq(1L -> toks.mkString(" "))
    val nGrams = toks.size - 2                       // k = 3
    val fps = sparkFps(docs, 3, 4)(1L)
    assert(fps.size <= nGrams / 2)                   // expected 2/(w+1) = 0.4
    assert(fps.size > nGrams / 10)                   // but not degenerate
  }

  test("winnowPairs finds the shared-run pair with consistent containment counts") {
    val run = "golf hotel india juliet kilo lima mike november"
    val docs = Seq[(Long, String)](
      1L -> s"first document context $run trailing material one two three",
      2L -> s"other introduction text $run separate ending words four five",
      3L -> "nothing in common with those two documents at all here")
    val rows = Dedup.winnowPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
        k = 3, w = 4, maxDf = 10, minShared = 1)
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    val r = rows.head
    val (nShared, nA, nB, cont) =
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
    assert(nShared >= 1 && nShared <= math.min(nA, nB))
    assert(cont > 0.0 && cont <= 1.0)
    assert(cont === math.floor(nShared.toDouble / math.min(nA, nB) * 1e6) / 1e6)
  }

  test("df cap drops hot fingerprints: stricter caps strictly shrink the pair set") {
    val run = "oscar papa quebec romeo sierra tango"
    // 12 docs share the 6-token run; the guaranteed in-run window
    // minimum is selected by ALL of them (df = 12), while boundary
    // windows select other run-gram hashes in smaller doc subsets.
    val docs = (1L to 12L).map(i =>
      i -> s"unique$i lead${i}in $run tail${i}a tail${i}b tail${i}c")
    def pairsAt(maxDf: Int): Set[(Long, Long)] =
      Dedup.winnowPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
          k = 3, w = 4, maxDf = maxDf, minShared = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every shared fingerprint has df >= 2, so maxDf = 1 kills all pairs
    assert(pairsAt(1).isEmpty)
    // the guaranteed fingerprint (df = 12) makes every pair: uncapped = all 66
    val uncapped = pairsAt(100)
    assert(uncapped.size === 66)
    // capping at 10 excludes exactly that hot block; what remains comes
    // from the smaller boundary-window selections — strictly fewer pairs
    val capped = pairsAt(10)
    assert(capped.subsetOf(uncapped) && capped.size < uncapped.size)
  }
}
