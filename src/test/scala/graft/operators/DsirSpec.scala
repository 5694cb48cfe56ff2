package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSIR importance resampling (operators.Dsir). The integer ppm
  * surface and the acceptance rule are oracle-gated end-to-end by
  * q109; these tests pin the exact arithmetic against a plain-Scala
  * reference, partitioning invariance / retry replayability of the
  * selection, the signal direction (target-like docs outscore
  * off-target ones — the property importance weighting exists for),
  * and the float log surface within tolerance of the same reference.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64 // small feature space: forces real collisions

  private def tok(s: String): Seq[String] =
    s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  private def polyRef(s: String): Long = {
    var h = 0L
    s.codePoints().forEach(cp => h = (h * 1000003L + cp) % 2147483647L)
    h
  }

  private def hash60Ref(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private def featRef(text: String): Map[Long, Long] = {
    val ts = tok(text)
    val grams = ts ++ ts.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    grams.groupBy(g => polyRef(g) % B).view.mapValues(_.size.toLong).toMap
  }

  /** Reference scorer: smoothed bucket ratio table in exact ppm, then
    * the feature-weighted truncated-integer mean per doc.
    */
  private def scoreRef(raw: Seq[(Long, String)], targetIds: Set[Long])
      : Map[Long, (Long, Long)] = {
    val feats = raw.map { case (id, t) => id -> featRef(t) }.toMap
    def totals(ids: Iterable[Long]): Map[Long, Long] =
      ids.flatMap(feats(_).toSeq).groupBy(_._1)
        .view.mapValues(_.map(_._2).sum).toMap
    val r = totals(raw.map(_._1))
    val t = totals(raw.map(_._1).filter(targetIds))
    val rtot = r.values.sum
    val ttot = t.values.sum
    feats.collect { case (id, f) if f.nonEmpty =>
      val nTot = f.values.sum
      val wSum = f.map { case (b, n) =>
        n * (1000000L * (t.getOrElse(b, 0L) + 1) * (rtot + B) /
          ((r(b) + 1) * (ttot + B)))
      }.sum
      id -> (nTot, wSum / nTot)
    }
  }

  // two sub-languages over disjoint vocabularies + shared function
  // words: "aurora" docs are the target register, "basalt" the rest
  private val corpus: Seq[(Long, String, String)] = (0L until 40L).map { i =>
    val shared = "the of and"
    if (i % 2 == 0)
      (i, s"aurora glacier $shared boreal fjord tundra drift i$i", "tgt")
    else
      (i, s"basalt magma $shared caldera vent fissure flow i$i", "oth")
  }

  private def docsDf = corpus.toDF("doc_id", "text", "kind")
  private def targetDf = docsDf.filter($"kind" === "tgt")

  test("importancePpm matches the exact-integer reference") {
    val got = Dsir.importancePpm(docsDf, targetDf, "doc_id", "text", B)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = scoreRef(corpus.map(c => (c._1, c._2)),
      corpus.filter(_._3 == "tgt").map(_._1).toSet)
    assert(got === want)
  }

  test("target-register docs outscore off-target docs") {
    val scores = Dsir.importancePpm(docsDf, targetDf, "doc_id", "text", B)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val tgt = corpus.filter(_._3 == "tgt").map(c => scores(c._1))
    val oth = corpus.filter(_._3 == "oth").map(c => scores(c._1))
    assert(tgt.min > oth.max,
      s"every target doc should outscore every off-target doc " +
        s"(tgt min ${tgt.min}, oth max ${oth.max})")
    // orientation: >1e6 = more target-like than the raw average
    assert(tgt.min > 1000000L && oth.max < 1000000L)
  }

  test("resample is partitioning-invariant and replayable") {
    def kept(parts: Int): Seq[Long] =
      Dsir.resample(docsDf.repartition(parts), targetDf.repartition(parts),
          "doc_id", "text", k = 10, B)
        .collect().map(_.getLong(0)).sorted.toSeq
    val a = kept(1)
    val b = kept(7)
    val c = kept(7) // the "speculative retry": same input, same set
    assert(a === b && b === c)
    assert(a.nonEmpty)
  }

  test("resample acceptance matches the cross-multiplied integer rule") {
    val scores = scoreRef(corpus.map(c => (c._1, c._2)),
      corpus.filter(_._3 == "tgt").map(_._1).toSet)
    val wsum = scores.values.map(_._2).sum
    val k = 10
    val want = scores.collect { case (id, (_, w))
        if (hash60Ref(s"dsir|$id") % 1000000L) * wsum < k * 1000000L * w => id }
      .toSeq.sorted
    val got = Dsir.resample(docsDf, targetDf, "doc_id", "text", k, B)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === want)
    // the target register must be enriched relative to its raw 50%
    val kinds = corpus.map(c => c._1 -> c._3).toMap
    val tgtShare = got.count(kinds(_) == "tgt").toDouble / got.size
    assert(tgtShare > 0.5, s"selected target share $tgtShare")
  }

  test("empty and zero-token docs are absent, not fabricated") {
    val withEmpty = (corpus :+ ((99L, "!!! ...", "oth")) :+ ((100L, "", "oth")))
      .toDF("doc_id", "text", "kind")
    val ids = Dsir.importancePpm(withEmpty, targetDf, "doc_id", "text", B)
      .collect().map(_.getLong(0)).toSet
    assert(!ids.contains(99L) && !ids.contains(100L))
    assert(ids.size === corpus.size)
  }

  test("frozen model: save/load round trip, batch-subset scores bit-equal to inline") {
    val dir = tmpDir("dsir-model")
    Dsir.saveModel(spark, dir, docsDf, targetDf, "doc_id", "text", B)
    val model = Dsir.loadModel(spark, dir, B)
    // model table equals the inline derivation exactly
    val inline = Dsir.ratioTable(docsDf, targetDf, "doc_id", "text", B)
      .collect().map(r => r.getLong(0) -> r.getLong(5)).toMap
    val loaded = model.collect().map(r =>
      r.getAs[Long]("bucket") -> r.getAs[Long]("ratio_ppm")).toMap
    assert(loaded === inline)
    // scoring a batch that is a subset of training raw == inline scores
    val batch = docsDf.filter($"doc_id" % 3 === 0)
    val frozen = Dsir.scoreWithModel(batch, "doc_id", "text", model, B)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val direct = Dsir.importancePpm(docsDf, targetDf, "doc_id", "text", B)
      .filter($"doc_id" % 3 === 0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(frozen === direct)
  }

  test("frozen model: unseen vocabulary takes the add-one floor, never drops rows") {
    val dir = tmpDir("dsir-model-unseen")
    Dsir.saveModel(spark, dir, docsDf, targetDf, "doc_id", "text", B)
    val model = Dsir.loadModel(spark, dir, B)
    // a batch doc of ENTIRELY novel vocabulary: every bucket may miss
    // the model — the row must survive with the floor ratio
    val novel = Seq((500L, "zzqx wvut plomk jrtne qqaz xxyy")).toDF("doc_id", "text")
    val got = Dsir.scoreWithModel(novel, "doc_id", "text", model, B).collect()
    assert(got.length === 1)
    val floorPpm = {
      val t = model.agg(max($"rtot"), max($"ttot")).head()
      1000000L * (t.getLong(0) + B) / (t.getLong(1) + B)
    }
    // every feature scored >= at the floor (novel buckets exactly at it;
    // hash collisions with trained buckets can only change it to a
    // trained ratio) — and with all-novel grams the mean IS the floor
    // unless a collision hits
    assert(got.head.getLong(2) >= math.min(floorPpm,
      model.agg(org.apache.spark.sql.functions.min($"ratio_ppm")).head().getLong(0)))
  }

  test("frozen model: missing or mismatched scheme stamp fails loudly") {
    val dir = tmpDir("dsir-model-stamp")
    Dsir.saveModel(spark, dir, docsDf, targetDf, "doc_id", "text", B)
    // wrong bucket count = different scheme -> refuse
    val e1 = intercept[IllegalStateException](Dsir.loadModel(spark, dir, B * 2))
    assert(e1.getMessage.contains("DSIR model") && e1.getMessage.contains("buckets="))
    // unstamped dir -> refuse
    val bare = tmpDir("dsir-model-bare")
    Dsir.ratioTable(docsDf, targetDf, "doc_id", "text", B)
      .write.mode("overwrite").parquet(s"$bare/ratios.parquet")
    val e2 = intercept[IllegalStateException](Dsir.loadModel(spark, bare, B))
    assert(e2.getMessage.contains("no _dsir_scheme.json stamp"))
  }

  test("logImportance matches a driver reference within 1e-9") {
    val feats = corpus.map { case (id, t, _) => id -> featRef(t) }.toMap
    def totals(ids: Iterable[Long]): Map[Long, Long] =
      ids.flatMap(feats(_).toSeq).groupBy(_._1)
        .view.mapValues(_.map(_._2).sum).toMap
    val r = totals(corpus.map(_._1))
    val t = totals(corpus.filter(_._3 == "tgt").map(_._1))
    val rtot = r.values.sum.toDouble
    val ttot = t.values.sum.toDouble
    def lg(x: Double) = math.log(x) / math.log(2.0)
    val want = feats.map { case (id, f) =>
      val n = f.values.sum.toDouble
      // same order as the operator's sorted fold: by bucket
      val s = f.toSeq.sortBy(_._1).map { case (b, nb) =>
        nb * (lg(t.getOrElse(b, 0L) + 1.0) - lg(ttot + B) -
          lg(r(b) + 1.0) + lg(rtot + B))
      }.sum
      id -> s / n
    }
    val got = Dsir.logImportance(docsDf, targetDf, "doc_id", "text", B)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (id, v) =>
      assert(math.abs(v - want(id)) < 1e-9, s"doc $id: $v vs ${want(id)}")
    }
  }
}
