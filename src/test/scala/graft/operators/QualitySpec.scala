package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualitySpec extends SparkSpec {

  test("repetitionSignals: token/bigram counters on hand-checked docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a"),            // 4 tok, 1 uniq; bigram "a a" x3 of 3
      (2L, "a b c d"),            // no repetition; each bigram once
      (3L, "go"),                 // single token: no bigrams
      (4L, ""),                   // empty: zero tokens
      (5L, "x y x y x"))          // 5 tok 2 uniq; "x y" x2, "y x" x2 of 4
      .toDF("doc_id", "text")
    val got = Quality.repetitionSignals(docs, "doc_id", "text")
      .orderBy("doc")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got === Seq(
      (1L, 4, 1, 3L, 3L),
      (2L, 4, 4, 1L, 3L),
      (3L, 1, 1, 0L, 0L),
      (4L, 0, 0, 0L, 0L),
      (5L, 5, 2, 2L, 4L)))
  }

  test("piiRedact counts and rewrites emails/phones, leaves clean text alone") {
    import spark.implicits._
    val rows = Seq(
      (1L, "reach me at jo.doe@mail.example.org or call 555-1234 now"),
      (2L, "two mails a@b.io c.d@e.co and 555-0000 555-9999"),
      (3L, "no pii here, 555-12345 is too long for the strict pattern"))
      .toDF("id", "txt")
    val got = Quality.piiRedact(rows, "txt").orderBy("id")
      .select("n_emails", "n_phones", "redacted").collect()
    assert(got(0).getLong(0) === 1L && got(0).getLong(1) === 1L)
    assert(got(0).getString(2) === "reach me at [EMAIL] or call [PHONE] now")
    assert(got(1).getLong(0) === 2L && got(1).getLong(1) === 2L)
    assert(got(1).getString(2) === "two mails [EMAIL] [EMAIL] and [PHONE] [PHONE]")
    // \b guard: 555-12345 must NOT match (no boundary after 4th digit)
    assert(got(2).getLong(0) === 0L && got(2).getLong(1) === 0L)
    assert(got(2).getString(2).contains("555-12345"))
  }

  test("decontaminate: 5-gram overlap, short docs fall back to whole-doc grams") {
    import spark.implicits._
    val train = Seq(
      (10L, "one two three four five six"),   // shares 5-gram with bench 1
      (11L, "totally different words here now friend"),
      (12L, "tiny doc"))                      // < 5 tokens -> whole-doc gram
      .toDF("doc_id", "text")
    val bench = Seq(
      (1L, "zero one two three four five"),   // "one two three four five"
      (2L, "tiny doc"))                       // exact short-doc collision
      .toDF("doc_id", "text")
    val got = Quality.decontaminate(train, bench, "doc_id", "text", n = 5)
      .orderBy("train_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === Seq((10L, 1L, 1L, 1L), (12L, 1L, 1L, 2L)))
  }

  test("capPerGroup: window-reference equality, small groups survive whole, replayable") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val docs = ((0L until 40L).map(i => (s"src${i % 3}", i)) :+ (("tiny", 99L)))
      .toDF("source", "doc_id")
    def run(parts: Int) =
      Quality.capPerGroup(docs.repartition(parts), "source", "doc_id", cap = 4)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    // reference: the window formulation over the identical hash order
    val hv = pmod(graft.functions.TextFunctions.hash60(
      concat(lit("cap|"), col("doc_id"))), lit(1L << 52))
    val want = docs.withColumn("hv", hv)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("hv"), col("doc_id"))))
      .filter(col("rank") <= 4)
      .collect().map(r => (r.getString(0), r.getInt(3), r.getLong(1))).toSet
    val got = run(1)
    assert(got === want)
    assert(got === run(7)) // partitioning-invariant / retry-replayable
    // the singleton group keeps its one doc at rank 1
    assert(got.contains(("tiny", 1, 99L)))
    // every multi-doc group is capped at exactly 4
    assert((0 until 3).forall(s => got.count(_._1 == s"src$s") === 4))
  }

  test("decontaminate never shuffles the training side (broadcast gram join)") {
    import spark.implicits._
    val train = (0L to 50L).map(i => (i, s"w$i x$i y$i z$i q$i r$i")).toDF("doc_id", "text")
    val bench = Seq((100L, "w1 x1 y1 z1 q1 r1")).toDF("doc_id", "text")
    val plan = Quality.decontaminate(train, bench, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast gram join, got:\n$plan")
  }

  test("corpusDrift: integer ppm rates and |shift| on hand-checked slices") {
    import spark.implicits._
    // side A: 10 tokens total, "cat" x4; side B: 5 tokens, "cat" x1
    val a = Seq((0L, "cat cat cat cat dog dog bird bird bird fish")).toDF("doc_id", "text")
    val b = Seq((1L, "cat dog dog emu emu")).toDF("doc_id", "text")
    val got = Quality.corpusDrift(a, b, "text", minCount = 1, topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toList
    // ppm: cat A 400000 B 200000 -> drift 200000; emu 0/400000; bird
    // 300000/0; dog 200000/400000; fish 100000/0
    assert(got === List(
      ("emu", 0L, 2L, 0L, 400000L, 400000L),
      ("bird", 3L, 0L, 300000L, 0L, 300000L),
      ("cat", 4L, 1L, 400000L, 200000L, 200000L),
      ("dog", 2L, 2L, 200000L, 400000L, 200000L),
      ("fish", 1L, 0L, 100000L, 0L, 100000L)))
  }

  test("corpusDrift: empty sides neither crash nor divide by zero") {
    import spark.implicits._
    val docs = Seq((0L, "alpha beta")).toDF("doc_id", "text")
    val none = docs.filter(col("doc_id") < 0)
    assert(Quality.corpusDrift(none, none, "text", minCount = 1).count() === 0L)
    val oneSided = Quality.corpusDrift(docs, none, "text", minCount = 1)
      .collect().map(r => (r.getString(0), r.getLong(3), r.getLong(4))).toSet
    assert(oneSided === Set(("alpha", 500000L, 0L), ("beta", 500000L, 0L)))
  }

  test("corpusDrift: minCount floor drops tail terms before ranking") {
    import spark.implicits._
    val a = Seq((0L, "hot hot hot hot hot rare")).toDF("doc_id", "text")
    val b = Seq((1L, "hot")).toDF("doc_id", "text")
    val terms = Quality.corpusDrift(a, b, "text", minCount = 2, topN = 10)
      .select("term").as[String].collect().toSet
    assert(terms === Set("hot"))
  }

  test("kmvDistinct: below k the estimate IS the exact count; duplicates never inflate") {
    import spark.implicits._
    val vals = Seq("a", "b", "c", "a", "a", "b").map(("g1", _)) ++
      Seq("x").map(("g2", _))
    val byGrp = Quality.kmvDistinct(vals.toDF("grp", "v"), "grp", "v", k = 64)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byGrp === Map("g1" -> ((3L, 3L)), "g2" -> ((1L, 1L))))
  }

  test("kmvDistinct: estimate lands in the k=64 error band and is partitioning-invariant") {
    import spark.implicits._
    val n = 5000
    val df = (0 until n).map(i => ("g", s"val-$i")).toDF("grp", "v")
    def est(d: org.apache.spark.sql.DataFrame): Long =
      Quality.kmvDistinct(d, "grp", "v", k = 64).collect()(0).getLong(2)
    val e1 = est(df)
    // ~1/sqrt(62) ≈ 13% standard error; allow 4 sigma
    assert(math.abs(e1 - n) < 0.52 * n, s"estimate $e1 outside the error band for $n")
    // partitioning and duplication change nothing: the sketch is a
    // pure function of the distinct value set
    assert(est(df.repartition(17)) === e1)
    assert(est(df.union(df)) === e1)
    // mergeability: bottom-k of (A ∪ B) == bottom-k over the union
    // frame — split halves and re-union
    val a = df.filter(expr("substring(v, 5) % 2 = 0"))
    val b = df.filter(expr("substring(v, 5) % 2 = 1"))
    assert(est(a.unionByName(b)) === e1)
  }

  test("profile: exact per-column stats, native-type min/max, null accounting, column subset") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "b"), (2L, null), (10L, "a"), (null, "a")
    ).toDF("id", "s")
    val got = Quality.profile(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    // native-type min/max: 10 > 2 numerically (a string-cast-first
    // profile would report max "2")
    assert(got("id") === ((4L, 1L, 3L, "1", "10")))
    assert(got("s") === ((4L, 1L, 2L, "a", "b")))
    // column subset + empty table: stats stay defined
    val empty = Quality.profile(df.filter(lit(false)), Seq("id")).collect()
    assert(empty.length === 1)
    assert(empty(0).getLong(1) === 0L && empty(0).getLong(3) === 0L)
    assert(empty(0).getString(4) == null)
  }

  test("stripBoilerplate: distinct-doc threshold, partial tails, empty docs, doc rebuild") {
    import spark.implicits._
    val docs = Seq(
      (1L, "nav bar alpha beta"),      // both segs boilerplate -> empty
      (2L, "nav bar gamma delta"),     // "nav bar" stripped, tail kept
      (3L, "nav bar"),                 // single boilerplate seg
      (4L, ""),                        // empty doc survives untouched
      (5L, "solo words here"),         // unique segs + partial tail "here"
      (6L, "alpha beta alpha beta"),   // seg repeats ACROSS docs (d1+d6)
      (7L, "x y x y"))                 // seg repeats only WITHIN one doc:
      .toDF("doc_id", "text")          //   distinct-doc count 1, KEPT
    val got = Quality.stripBoilerplate(docs, "doc_id", "text", segWidth = 2, minDocs = 2)
      .orderBy("doc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got === Seq(
      (1L, 2L, 2L, ""),
      (2L, 2L, 1L, "gamma delta"),
      (3L, 1L, 1L, ""),
      (4L, 0L, 0L, ""),
      (5L, 2L, 0L, "solo words here"),
      (6L, 2L, 2L, ""),
      (7L, 2L, 0L, "x y x y")))
  }

  test("snapshotDiff: added/removed/changed/unchanged partition on hand-built versions") {
    import spark.implicits._
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val v2 = Seq((2L, "b"), (3L, "c CHANGED"), (4L, "d")).toDF("doc_id", "text")
    val got = Quality.snapshotDiff(v1, v2, "doc_id", "text")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq(
      (1L, "removed"), (2L, "unchanged"), (3L, "changed"), (4L, "added")))
    // empty sides degrade to pure added / pure removed, never error
    val empty = v1.filter(org.apache.spark.sql.functions.lit(false))
    assert(Quality.snapshotDiff(empty, v2, "doc_id", "text")
      .collect().forall(_.getString(1) === "added"))
    assert(Quality.snapshotDiff(v1, empty, "doc_id", "text")
      .collect().forall(_.getString(1) === "removed"))
  }

  test("versionHistory: runs break on change, gap, birth; verbatim restore stays two rows") {
    import spark.implicits._
    val snaps = Seq(
      // doc 1: constant across 1..3 -> one [1,3] run
      (1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "a"),
      // doc 2: content change at v2 -> [1,1] + [2,3]
      (2L, 1L, "b"), (2L, 2L, "B"), (2L, 3L, "B"),
      // doc 3: deleted in v2, restored VERBATIM in v3 -> two [v,v]
      // rows (the audit truth: it was not in v2), same hash
      (3L, 1L, "c"), (3L, 3L, "c"),
      // doc 4: born at v3
      (4L, 3L, "d")).toDF("doc_id", "v", "t")
    val got = Quality.versionHistory(snaps, "doc_id", "v", "t")
      .orderBy("doc_id", "valid_from").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.map(x => (x._1, x._2, x._3)).toSeq === Seq(
      (1L, 1L, 3L), (2L, 1L, 1L), (2L, 2L, 3L),
      (3L, 1L, 1L), (3L, 3L, 3L), (4L, 3L, 3L)))
    // the restored run carries the SAME content hash as the original
    val d3 = got.filter(_._1 == 3L).map(_._4)
    assert(d3(0) === d3(1))
    // and the changed doc's two runs carry DIFFERENT hashes
    val d2 = got.filter(_._1 == 2L).map(_._4)
    assert(d2(0) !== d2(1))
  }

  test("countMinIncrement: linear absorb == one-shot build; replay is a no-op; shape guarded") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, explode}
    val docs = (0 until 60).map(i => (i.toLong, s"w${i % 7} w${i % 11} common tok$i"))
      .toDF("doc_id", "text")
    val state = java.nio.file.Files.createTempDirectory("cms-spec").toString
    Quality.countMinIncrement(spark, state, docs.filter(col("doc_id") < 30), "text", 3, 16, 0L)
    Quality.countMinIncrement(spark, state, docs.filter(col("doc_id") >= 30), "text", 3, 16, 1L)
    // at-least-once replay of batch 1: committed head must skip it
    Quality.countMinIncrement(spark, state, docs.filter(col("doc_id") >= 30), "text", 3, 16, 1L)
    val incr = Quality.readCmsSketch(spark, state).collect()(0).getSeq[Long](0)
    val oneShot = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      .agg(graft.functions.CountMin.sketch(3, 16)(col("term")))
      .collect()(0).getSeq[Long](0)
    assert(incr === oneShot)
    // generation dirs: bootstrap + one real increment, replay added none
    val gens = new java.io.File(state).listFiles().map(_.getName).filter(_.startsWith("gen-"))
    assert(gens.sorted.toSeq === Seq("gen-0", "gen-1"))
    // a differently-shaped caller must fail loudly, never add cells
    intercept[IllegalArgumentException] {
      Quality.countMinIncrement(spark, state, docs, "text", 4, 16, 2L)
    }
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(state))
  }

  test("stripBoilerplate: below threshold nothing is removed, rebuild is identity") {
    import spark.implicits._
    val docs = Seq((1L, "one two three four five"), (2L, "one two six"))
      .toDF("doc_id", "text")
    val got = Quality.stripBoilerplate(docs, "doc_id", "text", segWidth = 2, minDocs = 3)
      .orderBy("doc").collect()
    assert(got.map(_.getLong(2)).sum === 0L)
    assert(got.map(_.getString(3)).toSeq === Seq("one two three four five", "one two six"))
  }

  test("normalizeText: NFC recomposes, controls sweep to spaces BEFORE the collapse, trim") {
    import spark.implicits._
    val got = Seq(
      "e\u0301tude",           // decomposed -> must recompose
      "\u00e9tude",            // precomposed -> unchanged
      "a\t\u0001b",           // tab+SOH run -> ONE space (sweep, then collapse)
      " \u200d x \r\n",      // ZWJ (Cf), CR/LF, edge spaces -> "x"
      "plain ascii text",     // fast path: unchanged
      ""                      // empty survives
    ).toDF("t").select(Quality.normalizeText(col("t"))).as[String].collect().toSeq
    assert(got === Seq("\u00e9tude", "\u00e9tude", "a b", "x", "plain ascii text", ""))
  }

  test("normalizeText is idempotent and equalizes NFC-equivalent inputs") {
    import spark.implicits._
    val forms = Seq("e\u0301tude cafe\u0301", "\u00e9tude caf\u00e9")
    val once = forms.toDF("t").select(Quality.normalizeText(col("t")))
      .as[String].collect().toSeq
    assert(once.distinct.size === 1 && once.head === "\u00e9tude caf\u00e9")
    val twice = once.toDF("t").select(Quality.normalizeText(col("t")))
      .as[String].collect().toSeq
    assert(twice === once)
  }

  test("langSegments: per-window detection, priority ties, und and empty docs") {
    import spark.implicits._
    val en = "the a of and to in is it for on"     // 10 en stopwords
    val de = "der die und das ist von mit den auf ein" // 10 de stopwords
    val df = Seq(
      (0L, s"$en $en $de"),  // 3 segments: en, en, de
      (1L, ""),              // zero tokens
      (2L, "xyz abc foo"),   // one segment, no stopword hits -> und
      (3L, s"$en $de"))      // 1-1 tie -> langOrder priority: en
      .toDF("id", "t")
    val got = Quality.langSegments(df, "id", "t", segWidth = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got === Map(
      0L -> (3L, "en", 666666L, true),
      1L -> (0L, "und", 0L, false),
      2L -> (1L, "und", 1000000L, false), // und-only is NOT mixed
      3L -> (2L, "en", 500000L, true)))
    intercept[IllegalArgumentException] {
      Quality.langSegments(df, "id", "t", segWidth = 0)
    }
  }

  test("encodingAudit: mojibake pairs, replacement chars, controls, verdict precedence") {
    import spark.implicits._
    val df = Seq(
      (0L, "ok plain ascii"),
      (1L, "caf\u00c3\u00a9 menu"),          // Ã© — one mojibake pair
      (2L, "lost \ufffd byte"),
      (3L, "bell\u0007here"),
      // mojibake AND replacement: mojibake wins the verdict
      (4L, "\u00c3\u00a9 and \ufffd"),
      // a genuine accented word alone is NOT mojibake (é, no Ã pair)
      (5L, "caf\u00e9 r\u00e9sum\u00e9"))
      .toDF("id", "t")
    val got = Quality.encodingAudit(df, "id", "t")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(5))).toMap
    assert(got(0L) === ((0L, 0L, 0L, "clean")))
    assert(got(1L) === ((1L, 0L, 0L, "mojibake")))
    assert(got(2L) === ((0L, 1L, 0L, "replacement")))
    assert(got(3L) === ((0L, 0L, 1L, "control")))
    assert(got(4L) === ((1L, 1L, 0L, "mojibake")))
    assert(got(5L) === ((0L, 0L, 0L, "clean")))
  }

  test("shrunkGroupMean pulls small groups toward the global mean, large groups barely move") {
    import spark.implicits._
    // big: 10 values of 90 (sum 900); tiny: 2 values of 250 (sum 500)
    // global: 12 values, sum 1400 -> G = 1400 DIV 12 = 116
    val df = (Seq.fill(10)(("big", 90L)) ++ Seq(("tiny", 250L), ("tiny", 250L)))
      .toDF("g", "v")
    val got = Quality.shrunkGroupMean(df, "g", "v", priorWeight = 10L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val g = 1400L / 12L // = 116
    assert(got("big") === ((10L, 90L, (900L + 10L * g) / 20L)))   // 103
    assert(got("tiny") === ((2L, 250L, (500L + 10L * g) / 12L)))  // 138
    // the tiny group's 250 raw mean collapses BELOW... toward G while
    // the big group moves only ~13 points — the shrinkage invariant
    assert(got("tiny")._3 < got("tiny")._2 && got("tiny")._3 > g)
    intercept[IllegalArgumentException] {
      Quality.shrunkGroupMean(df, "g", "v", priorWeight = 0L)
    }
  }

  test("kmvJaccard: exact under k (subset, identical, disjoint); guards on k") {
    import spark.implicits._
    def vals(vs: String*) = vs.toDF("term")
    def run(a: Seq[String], b: Seq[String]) =
      Quality.kmvJaccard(vals(a: _*), vals(b: _*), "term", k = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).head
    // union 3 < k -> everything exact: J = 1/3, inter = 1
    assert(run(Seq("x", "y"), Seq("y", "z")) ===
      ((3L, 1L, 333333L, 3L, 1L)))
    // identical sets: J = 1, inter = union = 2
    assert(run(Seq("x", "y", "x"), Seq("y", "x")) ===
      ((2L, 2L, 1000000L, 2L, 2L)))
    // disjoint: J = 0, inter = 0
    assert(run(Seq("x"), Seq("z")) === ((2L, 0L, 0L, 2L, 0L)))
    intercept[IllegalArgumentException] {
      Quality.kmvJaccard(vals("x"), vals("y"), "term", k = 1)
    }
  }

  test("kAnonymityAudit: class sizes and the k flag; guards on inputs") {
    import spark.implicits._
    val df = Seq(
      ("en", "web"), ("en", "web"), ("en", "web"),
      ("en", "book"), ("de", "web"))
      .toDF("lang", "source")
    val audit = Quality.kAnonymityAudit(df, Seq("lang", "source"), k = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(audit === Map(
      ("en", "web") -> (3L, true), ("en", "book") -> (1L, false),
      ("de", "web") -> (1L, false)))
    intercept[IllegalArgumentException] {
      Quality.kAnonymityAudit(df, Seq.empty, k = 2)
    }
    intercept[IllegalArgumentException] {
      Quality.kAnonymityAudit(df, Seq("lang"), k = 0)
    }
  }

  test("scriptProfile: exact ppm per class, fixed-order dominance ties, empty text") {
    import spark.implicits._
    val df = Seq(
      (0L, "abc 123"),        // latin 3, digit 3, space 1, tot 7
      (1L, "中文"),   // pure CJK
      (2L, ""),               // empty -> all zero, dominant none
      (3L, "aтλ~")) // latin 1, cyrillic 1, greek 1, other 1
      .toDF("id", "t")
    val p = Quality.scriptProfile(df, "id", "t")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r0 = p(0L)
    assert(r0.getAs[Long]("latin_ppm") === 3L * 1000000L / 7L)
    assert(r0.getAs[Long]("digit_ppm") === 3L * 1000000L / 7L)
    assert(r0.getAs[Long]("space_ppm") === 1000000L / 7L)
    assert(r0.getAs[Long]("other_ppm") === 0L)
    // latin and digit tie at 3: class-list order breaks to latin
    assert(r0.getAs[String]("dominant") === "latin")
    assert(p(1L).getAs[Long]("cjk_ppm") === 1000000L)
    assert(p(1L).getAs[String]("dominant") === "cjk")
    assert(p(2L).getAs[Long]("latin_ppm") === 0L)
    assert(p(2L).getAs[String]("dominant") === "none")
    // four-way tie: latin wins by list order; each class counts 250000
    assert(p(3L).getAs[Long]("cyrillic_ppm") === 250000L)
    assert(p(3L).getAs[Long]("greek_ppm") === 250000L)
    assert(p(3L).getAs[Long]("other_ppm") === 250000L)
    assert(p(3L).getAs[String]("dominant") === "latin")
  }

  test("nfc_normalize expression: ASCII fast path, NFC short-circuit, SQL registration") {
    import graft.functions.NfcNormalize
    import org.apache.spark.unsafe.types.UTF8String
    val ascii = UTF8String.fromString("plain")
    // ASCII returns the SAME instance -- no allocation on the hot path
    assert(NfcNormalize.normalize(ascii) eq ascii)
    val dec = UTF8String.fromString("e\u0301")
    assert(NfcNormalize.normalize(dec).toString === "\u00e9")
    // already-NFC non-ASCII short-circuits to the same instance
    val pre = UTF8String.fromString("\u00e9")
    assert(NfcNormalize.normalize(pre) eq pre)
    // the registered SQL function resolves (GraftExtensions wiring)
    import spark.implicits._
    val viaSql = Seq("e\u0301").toDF("t")
      .selectExpr("nfc_normalize(t) AS n").as[String].collect()
    assert(viaSql.toSeq === Seq("\u00e9"))
  }

  test("countMinIncrement: half-committed replay (gen landed, head not flipped) converges") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, explode}
    val docs = (0 until 40).map(i => (i.toLong, s"w${i % 5} tok$i")).toDF("doc_id", "text")
    val state = java.nio.file.Files.createTempDirectory("cms-crash").toString
    Quality.countMinIncrement(spark, state, docs.filter(col("doc_id") < 20), "text", 3, 16, 0L)
    // simulate the crash: batch 1's gen dir landed but the head never flipped
    val orphan = new java.io.File(state, "gen-1")
    orphan.mkdirs()
    java.nio.file.Files.write(orphan.toPath.resolve("part-garbage.parquet"),
      Array[Byte](1, 2, 3))
    // an at-least-once replay recomputes against the unmoved head and
    // OVERWRITES the orphan — never crash-loops on errorifexists
    Quality.countMinIncrement(spark, state, docs.filter(col("doc_id") >= 20), "text", 3, 16, 1L)
    val incr = Quality.readCmsSketch(spark, state).collect()(0).getSeq[Long](0)
    val oneShot = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      .agg(graft.functions.CountMin.sketch(3, 16)(col("term")))
      .collect()(0).getSeq[Long](0)
    assert(incr === oneShot)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(state))
  }
}
