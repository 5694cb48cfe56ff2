package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    // 0 and 1: verbatim duplicates after normalization (case/punct differ)
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "The quick, brown FOX jumps over the lazy dog!"),
    // 2: near-dup of 0 (one word changed)
    (2L, "the quick brown fox leaps over the lazy dog"),
    // 3: unrelated
    (3L, "completely different content about spark query engines and joins"),
    // 4: reordered tokens of 0 (same bag, different order)
    (4L, "lazy dog the quick brown fox jumps over the"))
    .toDF("doc_id", "text")

  test("exactGroups finds normalized verbatim + reordered duplicates") {
    val groups = Dedup.exactGroups(docs, "doc_id", "text").collect()
    assert(groups.length === 1)
    val g = groups.head
    assert(g.getAs[Long]("canonical_id") === 0L)
    // 0, 1 and 4 share the sorted-distinct token set
    assert(g.getAs[Seq[Long]]("member_ids") === Seq(0L, 1L, 4L))
  }

  test("contentFingerprint is order-insensitive, rollingFingerprint is not") {
    val fps = docs.select($"doc_id",
      TextFunctions.contentFingerprint($"text").as("c"),
      TextFunctions.rollingFingerprint($"text").as("r"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(fps(0L)._1 === fps(4L)._1) // same bag
    assert(fps(0L)._2 !== fps(4L)._2) // different order
    assert(fps(0L)._1 !== fps(3L)._1)
  }

  test("minhashLshPairs surfaces the verbatim pair and skips unrelated docs") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical shingle sets => identical signatures => every band matches
    assert(pairs.contains((0L, 1L)))
    // (0,2) sits at jaccard ~0.4 where this band config catches with
    // p~0.2 — deliberately NOT asserted (LSH is probabilistic by design;
    // the oracle gate q28 pins the exact band behavior instead)
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated never passes verify
  }

  test("simhashPairs: verbatim dups at hamming 0; blocking keeps result exact") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", chunks = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val verbatim = pairs.find(p => p._1 == 0L && p._2 == 1L)
    assert(verbatim.exists(_._3 === 0))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ngramJaccardPairs with single block matches hand-computed jaccard") {
    val one = Seq((0L, "abcdef", "x"), (1L, "abcdef", "x")).toDF("doc_id", "text", "blk")
    val got = Dedup.ngramJaccardPairs(one, "doc_id", "text", "blk", threshold = 0.5).collect()
    assert(got.length === 1)
    assert(got.head.getDouble(2) === 1.0)
  }

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),   // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f)))  // opposite of 0
    .toDF("vec_id", "embedding")

  test("cosineTopK ranks by exact cosine with deterministic ties") {
    val res = Similarity.cosineTopK(
      vecs.filter($"vec_id" === 0L), vecs, "vec_id", "embedding", k = 3)
      .orderBy($"rank").collect()
    assert(res.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(1L, 2L, 3L))
    assert(math.abs(res.head.getAs[Double]("cosine") - 0.993884) < 1e-5)
  }

  test("lshTopK only pairs vectors in the same sign bucket") {
    val res = Similarity.lshTopK(vecs, vecs, "vec_id", "embedding", k = 3, bits = 2)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    // buckets (bits=2, dims 1-2 signs): v0=1, v1=3, v2=2, v3=0 — all
    // distinct buckets => no candidates anywhere
    assert(res.isEmpty)
  }

  test("lshMultiProbeTopK recovers 1-bit-away neighbors that single-bucket misses; dominates its candidate set") {
    // with bits=2, all four vecs land in DISTINCT buckets so single-
    // bucket lshTopK finds nothing (test above); every pair of buckets
    // here differs in <= 2 bits, and 1-bit flips recover exactly the
    // hamming-1 neighbors
    val multi = Similarity.lshMultiProbeTopK(vecs, vecs, "vec_id", "embedding", k = 3, bits = 2)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(multi.nonEmpty, "multi-probe found no candidates where 1-bit neighbors exist")
    // buckets: v0=1, v1=3, v2=2, v3=0 — hamming-1 pairs: (0,1),(0,3),(1,2),(2,3)
    assert(multi.contains((0L, 1L)) && multi.contains((1L, 0L)))
    assert(!multi.contains((0L, 2L)), "hamming-2 bucket must stay unprobed at 1-bit flips")
    // dominance on the real embeddings: every single-bucket candidate
    // pair is also a multi-probe candidate pair (probe set superset)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val single = pairs(Similarity.lshTopK(q, emb, "vec_id", "embedding", k = 1000, bits = 6))
    val multiBig = pairs(Similarity.lshMultiProbeTopK(q, emb, "vec_id", "embedding", k = 1000, bits = 6))
    assert(single.subsetOf(multiBig),
      s"single-bucket pairs missing from multi-probe: ${(single -- multiBig).take(5)}")
    assert(multiBig.size > single.size, "multi-probe should widen the candidate set on real data")
  }

  test("query-directed probes: recall@3 >= exhaustive 1-bit flipping at the same probe budget") {
    // The scaladoc's load-bearing claim (Similarity.lshMultiProbeTopK):
    // spending the b+1 probes where the boundary distances say misses
    // are beats spending them on ALL 1-bit flips. The query-directed
    // probe set is NOT a superset of exhaustive-1-bit (far 1-bit flips
    // are traded for cheap 2-bit flips), so the dominance test above
    // cannot gate it — this computes the exhaustive-1-bit reference
    // driver-side (500x64 vectors) and pins the recall floor at both
    // small testdata scales.
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val all = emb.collect()
        .map(r => (r.getAs[Long]("vec_id"),
          r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray))
        .sortBy(_._1)
      def cosine(a: Array[Double], b: Array[Double]): Double = {
        var dot = 0d; var na = 0d; var nb = 0d; var i = 0
        while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        dot / (math.sqrt(na) * math.sqrt(nb))
      }
      def top3(qid: Long, qv: Array[Double], cands: Seq[(Long, Array[Double])]): Set[Long] =
        cands.filter(_._1 != qid)
          .map { case (id, v) => (id, cosine(qv, v)) }
          .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSet
      val queries = all.filter(_._1 < 20)
      val exact = queries.map { case (qid, qv) => qid -> top3(qid, qv, all.toSeq) }.toMap
      def bucket(v: Array[Double]): Int =
        (0 until 6).map(d => if (v(d) > 0) 1 << d else 0).sum
      val byBucket = all.groupBy { case (_, v) => bucket(v) }
      val oneBitHits = queries.map { case (qid, qv) =>
        val probes = bucket(qv) +: (0 until 6).map(d => bucket(qv) ^ (1 << d))
        val cands = probes.distinct.flatMap(b => byBucket.getOrElse(b, Array.empty).toSeq)
        (top3(qid, qv, cands) intersect exact(qid)).size
      }.sum
      val multiHits = Similarity.lshMultiProbeTopK(
          emb.filter($"vec_id" < 20), emb, "vec_id", "embedding", k = 3, bits = 6)
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
        .count { case (q, n) => exact(q).contains(n) }
      assert(multiHits >= oneBitHits,
        s"$sf: query-directed recall@3 $multiHits/60 fell below exhaustive-1-bit $oneBitHits/60")
    }
  }

  test("ivfTopK searches only the query's inverted list") {
    // centroids: v0 (x-axis) and v2 (y-axis). v1 assigns to v0's list,
    // v3 (opposite of x) to v2's list (cos -1 vs 0 => y wins).
    val cents = vecs.filter($"vec_id" === 0L || $"vec_id" === 2L)
    val res = Similarity.ivfTopK(vecs, vecs, cents, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(res.contains((0L, 1L)) && res.contains((1L, 0L))) // same list
    assert(!res.contains((0L, 2L))) // different list, never compared
    assert(res.contains((2L, 3L))) // v3 lands in y-list with v2
  }

  test("topPairs returns the global most-similar pair first") {
    val res = Similarity.topPairs(vecs, "vec_id", "embedding", n = 2).collect()
    assert((res.head.getLong(0), res.head.getLong(1)) === (0L, 1L))
  }

  test("blockedTopPairs: candidates only from shared sign buckets; cosines differential-exact vs brute force") {
    // one band over the 3 sign bits: v0 (+,0,0)->key 1, v1 (+,+,0)->key 3,
    // v2 (0,+,0)->key 2, v3 (-,0,0)->key 0 — all distinct => no candidates
    val none = Similarity.blockedTopPairs(vecs, "vec_id", "embedding",
      n = 10, bands = 1, bitsPerBand = 3).collect()
    assert(none.isEmpty)

    // add a near-copy of v1 sharing its bucket; only that pair surfaces,
    // and its cosine must equal the brute-force (topPairs) value exactly
    val withDup = vecs.union(Seq((4L, Array(0.89f, 0.11f, 0.0f))).toDF("vec_id", "embedding"))
    val blocked = Similarity.blockedTopPairs(withDup, "vec_id", "embedding",
      n = 10, bands = 1, bitsPerBand = 3).collect()
    assert(blocked.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 4L)))
    val brute = Similarity.topPairs(withDup, "vec_id", "embedding", n = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(blocked.head.getDouble(2) === brute((1L, 4L)))
  }

  test("dim guard: too-narrow vectors fail fast with the sizing contract, not an index error") {
    // 4-dim vectors, bands*bitsPerBand = 64: the first evaluated row
    // must raise the contract message
    val narrow = Seq((1L, Array(1f, -1f, 1f, -1f)), (2L, Array(1f, 1f, 1f, 1f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.blockedTopPairs(narrow, "vec_id", "embedding",
        n = 5, bands = 8, bitsPerBand = 8).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("blockedTopPairs requires vectors with >= 64 components")))
    val e2 = intercept[Exception] {
      Similarity.lshTopK(narrow, narrow, "vec_id", "embedding", k = 2, bits = 6).collect()
    }
    assert(msgs(e2).exists(_.contains("lshTopK requires vectors with >= 6 components")))
    // parameter-level nonsense rejected before any job
    intercept[IllegalArgumentException] {
      Similarity.blockedTopPairs(narrow, "vec_id", "embedding", n = 5, bitsPerBand = 31)
    }
  }

  test("signBitsFor follows the occupancy rule and clamps to [4, 30]") {
    assert(Similarity.signBitsFor(100000L) === 7) // 100k/1024 -> 2^7
    assert(Similarity.signBitsFor(10000000L) === 14)
    assert(Similarity.signBitsFor(1000000000L) === 20)
    assert(Similarity.signBitsFor(1000000000L, targetPerBucket = 256) === 22)
    assert(Similarity.signBitsFor(100L) === 4) // clamp low
    assert(Similarity.signBitsFor(Long.MaxValue) === 30) // clamp high
  }

  test("connectedComponents merges chains transitively, keeps islands apart") {
    // chain 1-2-3 (no direct 1-3 edge) + island 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(1L) === 1L && cc(2L) === 1L && cc(3L) === 1L)
    assert(cc(10L) === 10L && cc(11L) === 10L)
  }

  test("StripVecDotCasts removes the double-copy transform over float arrays") {
    val df = Similarity.cosineTopK(
      vecs.filter($"vec_id" === 0L), vecs, "vec_id", "embedding", k = 1)
    val optimized = df.queryExecution.optimizedPlan.toString
    // vec_dot must consume the float attributes directly — no
    // transform(..., cast(double)) left anywhere under it
    assert(optimized.contains("vec_dot"), "vec_dot missing from plan")
    assert(!optimized.matches("(?s).*vec_dot\\(transform.*"),
      s"cast-transform survived under vec_dot:\n$optimized")
    // and results are unchanged (widening is exact)
    val r = df.collect().head
    assert(r.getAs[Long]("neighbor_id") === 1L)
    assert(math.abs(r.getAs[Double]("cosine") - 0.993884) < 1e-5)
  }

  test("vec_dot is NULL on length-mismatched vectors (both eval paths)") {
    import spark.implicits._
    graft.functions.VectorExpressions.register(spark)
    val df = Seq(
      (Array(1.0, 2.0), Array(3.0, 4.0, 5.0)),
      (Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    // codegen path
    val gen = df.selectExpr("vec_dot(a, b) AS d").collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(gen.toSeq == Seq(None, Some(11.0)))
    // interpreted path (codegen off forces nullSafeEval)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.selectExpr("vec_dot(a, b) AS d").collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getDouble(0)))
      assert(interp.toSeq == Seq(None, Some(11.0)))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("langId picks stopword-matching language, und when no hits") {
    val df = Seq(
      "the cat is on the mat and it is happy",
      "el gato y la casa de los perros",
      "zzz qqq xxx").toDF("text")
      .select(TextFunctions.langId($"text").as("l"))
    assert(df.collect().map(_.getString(0)).toSeq === Seq("en", "es", "und"))
  }

  test("token counts: whitespace vs BPE-ish") {
    val df = Seq("Hello, world! 42 tokens").toDF("text").select(
      TextFunctions.whitespaceTokenCount($"text").as("ws"),
      TextFunctions.bpeTokenCount($"text").as("bpe"))
    val r = df.collect().head
    assert(r.getInt(0) === 4)
    // Hello , world ! 42 tokens => 6
    assert(r.getInt(1) === 6)
  }

  test("cross-operator consistency: exact contamination spans imply the 5-gram flag") {
    // every doc q110 reports (an exact shared substring of >= 8
    // tokens) MUST be flagged by q67's fixed-5-gram decontamination —
    // an 8-token shared run contains a shared 5-gram. The converse is
    // deliberately false (a lone shared 5-gram is below q110's
    // minLen). Run on live testdata with the queries' own split.
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables(spark, dir, "documents")
    val train = docs.filter($"doc_id" % 19 =!= 0)
    val bench = docs.filter($"doc_id" % 19 === 0)
    val spanned = Dedup.saSharedSpans(train, bench, "doc_id", "text",
        minLen = 8, maxLen = 32)
      .select($"doc_id").distinct().collect().map(_.getLong(0)).toSet
    val flagged = Quality.decontaminate(train, bench, "doc_id", "text", n = 5)
      .select($"train_id").distinct().collect().map(_.getLong(0)).toSet
    assert(spanned.subsetOf(flagged),
      s"exact spans without the 5-gram flag: ${spanned.diff(flagged).toSeq.sorted.take(5)}")
  }

  test("cdcChunks: reconstruction, cross-doc chunk identity, prefix-edit locality") {
    val longText = (0 until 200).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, longText),
      (2L, longText),              // identical doc -> identical chunk stream
      (3L, "zz qq " + longText))   // prefix insertion
      .toDF("doc_id", "text")
    val rows = Dedup.cdcChunks(docs, "doc_id", "text", avgSize = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    def chunksOf(d: Long) = rows.filter(_._1 == d).sortBy(_._2)
    val c1 = chunksOf(1L)
    assert(c1.length >= 2, "fixture must chunk (probabilistically certain)")
    // chunk ids are 0-based consecutive; token counts reconstruct the doc
    assert(c1.map(_._2).toSeq === (0L until c1.length.toLong))
    assert(c1.map(_._3).sum === 200L)
    // identical docs chunk identically
    assert(chunksOf(2L).map(x => (x._2, x._3, x._4)).toSeq ===
      c1.map(x => (x._2, x._3, x._4)).toSeq)
    // CONTENT-DEFINED: after the original's first boundary everything
    // re-aligns — c1's chunk-hash stream from index 1 survives as a
    // SUFFIX of the edited doc's stream (the inserted tokens can only
    // perturb chunks before that point; fixed-width would shift all)
    val c3 = chunksOf(3L)
    assert(c3.map(_._4).endsWith(c1.map(_._4).drop(1).toSeq))
    assert(c3.head._4 !== c1.head._4)
    intercept[IllegalArgumentException] {
      Dedup.cdcChunks(docs, "doc_id", "text", avgSize = 1)
    }
  }

  test("removeDuplicatesKeepBest keeps the max-score member, ties to min id; constant score = min-id rule") {
    val corpus = Seq(
      (0L, "short", 5L), (1L, "longer text", 11L), (2L, "longer other", 11L),
      (3L, "untouched", 9L), (4L, "mid", 3L))
      .toDF("doc_id", "text", "len")
    // clusters: {0,1,2} labeled 0; 4 a singleton cluster of itself
    val clusters = Seq((0L, 0L), (1L, 0L), (2L, 0L), (4L, 4L))
      .toDF("doc", "cluster")
    // scores: 1 and 2 tie at 11 -> min id 1 survives; 3 not clustered
    // survives; singleton 4 survives trivially
    val kept = Dedup.removeDuplicatesKeepBest(corpus, "doc_id", clusters, "len")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L, 4L))
    // constant score degenerates to removeDuplicates' min-id rule
    val const = Dedup.removeDuplicatesKeepBest(
      corpus.withColumn("one", lit(1L)), "doc_id", clusters, "one")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val minId = Dedup.removeDuplicates(corpus, "doc_id", clusters)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(const === minId)
    assert(const === Set(0L, 3L, 4L))
  }

  test("removeDuplicatesKeepBest: fractional scores compare on the native type; non-numeric fails loudly") {
    val corpus = Seq((0L, "a", 0.91), (1L, "b", 0.97), (2L, "c", 0.33))
      .toDF("doc_id", "text", "q")
    val clusters = Seq((0L, 0L), (1L, 0L), (2L, 0L)).toDF("doc", "cluster")
    // all scores in (0, 1): a silent long cast would truncate every score
    // to 0 and elect min id 0; the native comparison elects the true max
    val kept = Dedup.removeDuplicatesKeepBest(corpus, "doc_id", clusters, "q")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L))
    intercept[IllegalArgumentException] {
      Dedup.removeDuplicatesKeepBest(corpus, "doc_id", clusters, "text")
    }
  }
}
