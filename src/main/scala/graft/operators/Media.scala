package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary`
  * columns with typed metadata, plus the decode / feature-extract /
  * frame-sample stages of a media training-data pipeline.
  *
  * The image and audio paths decode FOR REAL: [[ImageCodec]] parses
  * PPM/PGM/BMP payloads and [[AudioCodec]] parses WAV/PCM payloads
  * (header + single-pass sample stats) inside the same
  * `mapPartitions` boundary; [[decodeImages]]/[[decodeAudio]] are the
  * typed surfaces, and q102/q103 hash-gate them end-to-end against
  * DuckDB oracles that recompute the stats from the source bytes.
  * Video decodes FOR REAL too for uncompressed YUV4MPEG2 streams
  * ([[VideoCodec]] — stream header, frame walk, plane geometry, luma
  * stats; q111 hash-gates it); COMPRESSED video codecs (H.264 etc.)
  * remain out of scope for this environment (a dependency-free
  * entropy decoder is not a reasonable build) and fall through to
  * [[decodeFeatures]]'s documented byte-arithmetic profile (the q44
  * contract).
  *
  * Scale notes: decode runs via `mapPartitions` so a real decoder
  * amortizes per-partition init (model load, codec context) the same
  * way mapInPandas batches do; binary payloads stay columnar in parquet
  * and are never shuffled (features are extracted before any wide op);
  * [[ImageCodec]] streams its stats in O(1) memory per record, so
  * partition memory is bounded by the payload column itself.
  */
object Media {

  /** Typed media record: opaque payload + the metadata a real ingest
    * would carry alongside it.
    */
  case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      format: String, // e.g. png | wav | mp4
      data: Array[Byte])

  /** Generic media profile row: REAL parsed dims for payloads
    * [[ImageCodec]] recognizes, documented byte-arithmetic dims
    * otherwise (see [[decodeFeatures]]).
    */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      // image-ish: fake dimensions decoded from the payload
      width: Int,
      height: Int,
      // audio/video-ish: fake duration
      duration_ms: Long,
      // content digest of the payload (real, not stubbed)
      byte_mean: Double)

  /** Documents -> opaque media table: deterministic reinterpretation of
    * the text payload as bytes, with kind/format cycling by doc_id.
    * This is the ingest-shape adapter used by tests and queries (the
    * testdata ships no binary table; payload bytes must still come from
    * driver data, not synthesized noise).
    */
  def fromDocuments(docs: DataFrame): DataFrame = {
    val kind = element_at(
      typedLit(Seq("image", "audio", "video")),
      (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
    val fmt = element_at(
      typedLit(Seq("png", "wav", "mp4")),
      (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
    docs.select(
      col("doc_id").as("media_id"),
      kind.as("kind"),
      fmt.as("format"),
      encode(col("text"), "UTF-8").as("data"))
  }

  /** Generic payload profile with REAL codec fast paths: payloads
    * whose magic [[ImageCodec]] recognizes (PPM/PGM/BMP) report the
    * parsed raster dimensions and duration 0 (still image); payloads
    * [[AudioCodec]] recognizes (WAV) report the parsed clip duration
    * and dimensions 0. Unrecognized payloads (video/text — no codec
    * libraries in this environment for those) get the documented
    * byte-arithmetic profile q44 pins: dims folded from the byte
    * length, duration 10 ms/byte. `byte_mean` is the raw payload mean
    * in every branch (a content digest, not a sample stat — see
    * [[decodeImages]]/[[decodeAudio]] for real per-channel stats).
    */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init happens HERE for codecs that need it
      // (contexts, model weights); both codecs here are stateless.
      it.map { m =>
        val n = m.data.length.toLong
        var mean = 0d
        var i = 0
        while (i < m.data.length) { mean += (m.data(i) & 0xff); i += 1 }
        if (n > 0) mean /= n
        val image = if (ImageCodec.sniff(m.data)) ImageCodec.decode(m.data).toOption else None
        lazy val audio = if (AudioCodec.sniff(m.data)) AudioCodec.decode(m.data).toOption else None
        lazy val video = if (VideoCodec.sniff(m.data)) VideoCodec.decode(m.data).toOption else None
        (image, audio) match {
          case (Some(s), _) =>
            MediaFeatures(m.media_id, m.kind, n, s.width, s.height, 0L, mean)
          case (None, Some(a)) =>
            MediaFeatures(m.media_id, m.kind, n, 0, 0, a.durationMs, mean)
          case _ => video match {
            case Some(v) =>
              MediaFeatures(m.media_id, m.kind, n, v.width, v.height, v.durationMs, mean)
            case None =>
              MediaFeatures(m.media_id, m.kind, n,
                (n % 640 + 1).toInt, (n % 480 + 1).toInt, n * 10, mean)
          }
        }
      }
    }
  }

  /** Typed per-image stats from [[ImageCodec]]'s real decode. Corrupt
    * payloads become `ok = false` rows carrying the parse error — an
    * error CHANNEL, not a task failure, so one bad record in a
    * trillion-row media table is routable instead of fatal.
    */
  final case class ImageFeatures(
      media_id: Long,
      codec: String,
      ok: Boolean,
      err: String,
      width: Int,
      height: Int,
      channels: Int,
      maxval: Int,
      n_pixels: Long,
      r_mean: Double,
      g_mean: Double,
      b_mean: Double,
      px_min: Int,
      px_max: Int)

  /** REAL image decode over the opaque media table: one streaming
    * parse per record behind the `mapPartitions` boundary. The q102
    * oracle hash-gates the whole path — header parse, raster offset,
    * channel de-interleave, exact integer sums — against DuckDB
    * recomputing the same stats from the source bytes.
    */
  def decodeImages(media: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        ImageCodec.decode(m.data) match {
          case Right(s) =>
            ImageFeatures(m.media_id, s.codec, ok = true, "", s.width, s.height,
              s.channels, s.maxval, s.nPixels, s.rMean, s.gMean, s.bMean,
              s.pxMin, s.pxMax)
          case Left(e) =>
            ImageFeatures(m.media_id, "", ok = false, e, 0, 0, 0, 0, 0L, 0d, 0d, 0d, 0, 0)
        }
      }
    }
  }

  /** Per-image perceptual hash row ([[ImageCodec.aHash]]), same error
    * channel as [[ImageFeatures]]; `hi`/`lo` are the two 32-bit halves
    * of the 64-bit average-hash.
    */
  final case class ImageAHash(media_id: Long, ok: Boolean, err: String, hi: Long, lo: Long)

  /** REAL perceptual hashing over the opaque media table — the decode
    * half of [[imageNearDupPairs]], one streaming parse per record.
    */
  def imageAHash(media: Dataset[MediaRecord]): Dataset[ImageAHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        ImageCodec.aHash(m.data) match {
          case Right((hi, lo)) => ImageAHash(m.media_id, ok = true, "", hi, lo)
          case Left(e) => ImageAHash(m.media_id, ok = false, e, 0L, 0L)
        }
      }
    }
  }

  /** Image near-duplicate pairs by perceptual hash: every (a, b),
    * a < b, whose aHashes differ in at most `maxHamming` of 64 bits —
    * the multimodal counterpart of text SimHash dedup (q29), and the
    * operator behind "drop re-encoded copies of the same image" in a
    * multimodal curation pass.
    *
    * Scale shape: the 64-bit hash splits into 8 8-bit bands; by
    * pigeonhole any pair within hamming <= 7 agrees EXACTLY on some
    * band, so candidates come from 8 equi-joins on (band, value) —
    * never an all-pairs scan (`maxHamming` is capped at 7 to keep
    * that guarantee). Candidates then verify with the exact popcount
    * distance. Identical-image floods concentrate in one band bucket
    * but stay equi-join candidates, the same degenerate shape the
    * LSH dedup family already pins in AdversarialCorpusSpec.
    */
  def imageNearDupPairs(media: Dataset[MediaRecord], maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"maxHamming must be in [0, 7] (8 bands guarantee recall only to 7): $maxHamming")
    val h = imageAHash(media).toDF().filter(col("ok"))
      .select(col("media_id"), col("hi"), col("lo"))
    // dynamic shift: band b reads bits [8b, 8b+8) of its half
    val bands = h.select(col("media_id"), col("hi"), col("lo"),
      explode(sequence(lit(0), lit(7))).as("band"))
      .withColumn("bval",
        call_function("shiftright",
          when(col("band") < 4, col("lo")).otherwise(col("hi")),
          (pmod(col("band"), lit(4)) * 8).cast("int"))
          .bitwiseAND(lit(255L)))
    val a = bands.select(col("media_id").as("id_a"), col("hi").as("hi_a"),
      col("lo").as("lo_a"), col("band"), col("bval"))
    val b = bands.select(col("media_id").as("id_b"), col("hi").as("hi_b"),
      col("lo").as("lo_b"), col("band"), col("bval"))
    a.join(b, Seq("band", "bval"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("hi_a"), col("lo_a"), col("hi_b"), col("lo_b"))
      .distinct()
      .withColumn("hamming",
        (bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
          bit_count(col("lo_a").bitwiseXOR(col("lo_b")))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Per-clip perceptual hash row ([[AudioCodec.aHash]]), same error
    * channel as [[ImageFeatures]]; `ahash` is the 32-bit waveform
    * signature (fits one BIGINT — no split needed at 32 bits).
    */
  final case class AudioAHash(media_id: Long, ok: Boolean, err: String, ahash: Long)

  /** REAL perceptual hashing over decoded waveforms — the audio half
    * of the multimodal near-dup family.
    */
  def audioAHash(media: Dataset[MediaRecord]): Dataset[AudioAHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        AudioCodec.aHash(m.data) match {
          case Right(h) => AudioAHash(m.media_id, ok = true, "", h)
          case Left(e) => AudioAHash(m.media_id, ok = false, e, 0L)
        }
      }
    }
  }

  /** Audio near-duplicate pairs by waveform signature — the audio twin
    * of [[imageNearDupPairs]] ("drop re-encoded copies of the same
    * clip"): 4 8-bit bands over the 32-bit hash, so by pigeonhole any
    * pair within hamming <= 3 agrees exactly on a band; candidates
    * come from 4 equi-joins, verified with the exact popcount.
    */
  def audioNearDupPairs(media: Dataset[MediaRecord], maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming must be in [0, 3] (4 bands guarantee recall only to 3): $maxHamming")
    val h = audioAHash(media).toDF().filter(col("ok"))
      .select(col("media_id"), col("ahash"))
    val bands = h.select(col("media_id"), col("ahash"),
      explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bval",
        call_function("shiftright", col("ahash"), (col("band") * 8).cast("int"))
          .bitwiseAND(lit(255L)))
    val a = bands.select(col("media_id").as("id_a"), col("ahash").as("h_a"),
      col("band"), col("bval"))
    val b = bands.select(col("media_id").as("id_b"), col("ahash").as("h_b"),
      col("band"), col("bval"))
    a.join(b, Seq("band", "bval"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("h_a"), col("h_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Typed per-clip stats from [[AudioCodec]]'s real decode, with the
    * same error-channel shape as [[ImageFeatures]].
    */
  final case class AudioFeatures(
      media_id: Long,
      codec: String,
      ok: Boolean,
      err: String,
      channels: Int,
      sample_rate: Int,
      bits: Int,
      n_frames: Long,
      duration_ms: Long,
      mean: Double,
      s_min: Int,
      s_max: Int)

  /** REAL audio decode over the opaque media table — the audio
    * sibling of [[decodeImages]]; q103 hash-gates the whole path
    * (RIFF chunk walk, fmt parse, PCM sample scan) against DuckDB
    * recomputing the stats from the source bytes.
    */
  def decodeAudio(media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val decoded =
          if (FlacCodec.sniff(m.data)) FlacCodec.decode(m.data)
          else AudioCodec.decode(m.data)
        decoded match {
          case Right(a) =>
            AudioFeatures(m.media_id, a.codec, ok = true, "", a.channels,
              a.sampleRate, a.bits, a.nFrames, a.durationMs, a.mean, a.sMin, a.sMax)
          case Left(e) =>
            AudioFeatures(m.media_id, "", ok = false, e, 0, 0, 0, 0L, 0L, 0d, 0, 0)
        }
      }
    }
  }

  /** Typed per-payload MP3 container metadata ([[Mp3Meta]]) with the
    * standard error-channel shape.
    */
  final case class Mp3MetaRow(
      media_id: Long,
      ok: Boolean,
      err: String,
      version: String,
      layer: Int,
      bitrate_kbps: Int,
      sample_rate: Int,
      channels: Int,
      n_frames: Long,
      duration_ms: Long,
      vbr: Boolean,
      title: String,
      artist: String)

  /** MP3 census metadata over the opaque media table — ID3v2 tag walk
    * + MPEG frame-header walk, no entropy decode (see [[Mp3Meta]]);
    * q240 hash-gates the whole path. Map-only, the decodeAudio shape.
    */
  def decodeMp3Meta(media: Dataset[MediaRecord]): Dataset[Mp3MetaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        Mp3Meta.decode(m.data) match {
          case Right(s) =>
            Mp3MetaRow(m.media_id, ok = true, "", s.version, s.layer, s.bitrateKbps,
              s.sampleRate, s.channels, s.nFrames, s.durationMs, s.vbr, s.title, s.artist)
          case Left(e) =>
            Mp3MetaRow(m.media_id, ok = false, e, "", 0, 0, 0, 0, 0L, 0L, vbr = false, "", "")
        }
      }
    }
  }

  /** Documents -> REAL MP3 payloads, deterministically: an ID3v2.3
    * tag (`doc <id>` / `src <id%7>`) and len%7+1 MPEG1 Layer III
    * frames with the bitrate index rotating over the full table
    * (doc_id%14+1) and the sample rate over all three MPEG1 rates
    * (doc_id%3), mono, payload bytes cycling the text. Every census
    * field is a pure function of (doc_id, len), so the q240 oracle
    * recomputes them all — a wrong frame-length formula, a misread
    * bitrate nibble, or a tag-size slip desyncs the walk and
    * hash-fails.
    */
  def toMp3(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(length(col("text")) > 0)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("px"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        MediaRecord(id, "audio", "mp3",
          Mp3Meta.encodeMp3(s"doc $id", s"src ${id % 7}",
            nFrames = bytes.length % 7 + 1,
            bitrateIdx = (id % 14).toInt + 1, rateIdx = (id % 3).toInt,
            mono = true, fill = bytes,
            // r20: every fifth tag rides the v2.3 unsynchronisation
            // flag — same surfaced fields, so no oracle churn
            unsync = id % 5 == 0))
      }
      .toDF()
  }

  /** Typed per-payload Ogg container metadata ([[OggMeta]]) with the
    * standard error-channel shape.
    */
  final case class OggMetaRow(
      media_id: Long,
      ok: Boolean,
      err: String,
      codec: String,
      channels: Int,
      sample_rate: Int,
      pre_skip: Int,
      n_pages: Long,
      last_granule: Long,
      duration_ms: Long)

  /** Ogg census metadata over the opaque media table — CRC-verified
    * page walk + first-packet codec ID, duration from the terminal
    * granule position (see [[OggMeta]]); q243 hash-gates the path.
    */
  def decodeOggMeta(media: Dataset[MediaRecord]): Dataset[OggMetaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        OggMeta.decode(m.data) match {
          case Right(s) =>
            OggMetaRow(m.media_id, ok = true, "", s.codec, s.channels,
              s.sampleRate, s.preSkip, s.nPages, s.lastGranule, s.durationMs)
          case Left(e) =>
            OggMetaRow(m.media_id, ok = false, e, "", 0, 0, 0, 0L, 0L, 0L)
        }
      }
    }
  }

  /** Documents -> REAL Ogg payloads, deterministically: even docs an
    * Opus stream (pre-skip len%1000, terminal granule pre_skip+len*48
    * — so the duration is EXACTLY len ms), odd docs a Vorbis stream
    * (rate len%4000+4000, terminal granule len*3), len%5+1 audio
    * pages after the BOS/ID page, every page CRC'd. Every census
    * field is a pure function of (doc_id, len) — the q240 rule.
    */
  def toOgg(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(length(col("text")) > 0)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("px"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val len = bytes.length
        val channels = ((id / 2) % 2).toInt + 1
        val nPages = len % 5 + 1
        val rec =
          if (id % 2 == 0)
            OggMeta.encodeOgg("opus", channels, 48000, len % 1000,
              nPages, (len % 1000).toLong + len.toLong * 48, bytes)
          else
            OggMeta.encodeOgg("vorbis", channels, len % 4000 + 4000, 0,
              nPages, len.toLong * 3, bytes)
        MediaRecord(id, "audio", if (id % 2 == 0) "opus" else "vorbis", rec)
      }
      .toDF()
  }

  /** Documents -> REAL CCITT G4 fax TIFFs (r19), deterministically:
    * a (L%100+30) x (L%40+10) BILEVEL page whose black flags are the
    * parity of the text bytes repeated/truncated (black iff odd
    * codepoint), photometric 0 (MinIsWhite), strips of 8 rows —
    * independent T.6 streams with a partial last strip. The q257
    * oracle recomputes the white fraction, min/max, and dims from
    * the text alone (decoded luminance = 255 for even codepoints,
    * 0 for odd).
    */
  def toTiffG4(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val len = length(col("text"))
    docs.filter(len > 0)
      .withColumn("w", (pmod(len, lit(100)) + lit(30)).cast("int"))
      .withColumn("h", (pmod(len, lit(40)) + lit(10)).cast("int"))
      .withColumn("npx", col("w") * col("h"))
      .select(col("doc_id"), col("w"), col("h"),
        encode(expr("substring(repeat(text, cast(ceil(cast(npx as double) / length(text)) as int)), 1, npx)"),
          "UTF-8").as("px"))
      .as[(Long, Int, Int, Array[Byte])]
      .map { case (id, w, h, px) =>
        val bits = px.map(b => ((b & 0xff) % 2).toByte)
        MediaRecord(id, "image", "tiff",
          TiffCodec.encodeTiffG4(bits, w, h, rowsPerStrip = 8,
            littleEndian = id % 2 == 0))
      }
      .toDF()
  }

  /** Documents -> REAL JPEG-in-TIFF payloads (r20, Compression 7 —
    * the scanner-output staple), deterministically: the SAME
    * flat-tile rasters as [[toJpeg]] (exactly invertible through the
    * lossy codec, the q227 rule) wrapped as single-strip TIFFs —
    * even docs grayscale 8x tiles / photometric 1, odd docs 4:2:0
    * color 16x tiles / photometric 6 — with doc_id%4 >= 2 records in
    * the TIFF/EP shared-tables form (DQT/DHT moved to tag 347, the
    * strip abbreviated); byte order alternates (doc_id/2)%2. The
    * q262 oracle is q227's with the codec renamed.
    */
  def toTiffJpeg(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val len = length(col("text"))
    docs.filter(len > 0)
      .withColumn("tw", (pmod(len, lit(3)) + lit(1)).cast("int"))
      .withColumn("th", (pmod(len, lit(2)) + lit(1)).cast("int"))
      .withColumn("nt", col("tw") * col("th"))
      .select(col("doc_id"), col("tw"), col("th"),
        encode(expr("substring(repeat(text, cast(ceil(cast(nt as double) / length(text)) as int)), 1, nt)"),
          "UTF-8").as("px"))
      .as[(Long, Int, Int, Array[Byte])]
      .map { case (id, tw, th, vals) =>
        def raster(tile: Int): Array[Byte] = {
          val w = tw * tile
          Array.tabulate(w * th * tile) { k =>
            vals(((k / w) / tile) * tw + (k % w) / tile)
          }
        }
        val le = (id / 2) % 2 == 0
        val withTables = id % 4 >= 2
        val bytes =
          if (id % 2 == 0) {
            val jpeg = JpegCodec.encodeJpegGray(raster(8), 8 * tw, 8 * th)
            TiffCodec.encodeTiffJpeg(jpeg, 8 * tw, 8 * th, 1, withTables, le)
          } else {
            val rgb = raster(16).flatMap(v => Array(v, v, v))
            val jpeg = JpegCodec.encodeJpeg(rgb, 16 * tw, 16 * th, subsample = true)
            TiffCodec.encodeTiffJpeg(jpeg, 16 * tw, 16 * th, 3, withTables, le)
          }
        MediaRecord(id, "image", "tiff", bytes)
      }
      .toDF()
  }

  /** Documents -> REAL G3-family fax TIFFs (r20), deterministically:
    * a (L%80+25) x (L%30+12) BILEVEL page, black iff odd codepoint
    * (the toTiffG4 raster rule), photometric 0, strips of 7 rows —
    * compression rotating doc_id%3 through MH (2), T.4 1D (3), and
    * T.4 2D (3 with T4Options bit 0), byte order by parity. The q261
    * oracle recomputes every stat from the text alone.
    */
  def toTiffG3(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val len = length(col("text"))
    docs.filter(len > 0)
      .withColumn("w", (pmod(len, lit(80)) + lit(25)).cast("int"))
      .withColumn("h", (pmod(len, lit(30)) + lit(12)).cast("int"))
      .withColumn("npx", col("w") * col("h"))
      .select(col("doc_id"), col("w"), col("h"),
        encode(expr("substring(repeat(text, cast(ceil(cast(npx as double) / length(text)) as int)), 1, npx)"),
          "UTF-8").as("px"))
      .as[(Long, Int, Int, Array[Byte])]
      .map { case (id, w, h, px) =>
        val bits = px.map(b => ((b & 0xff) % 2).toByte)
        val (compression, twoD) = (id % 3) match {
          case 0 => (2, false)
          case 1 => (3, false)
          case _ => (3, true)
        }
        MediaRecord(id, "image", "tiff",
          TiffCodec.encodeTiffG3(bits, w, h, compression, twoD,
            rowsPerStrip = 7, littleEndian = id % 2 == 0))
      }
      .toDF()
  }

  /** Typed per-payload MP4/ISO-BMFF container metadata ([[Mp4Meta]])
    * with the standard error-channel shape.
    */
  final case class Mp4MetaRow(
      media_id: Long,
      ok: Boolean,
      err: String,
      brand: String,
      minor_version: Long,
      timescale: Long,
      duration_ms: Long,
      n_tracks: Int,
      width: Int,
      height: Int,
      video_codec: String,
      audio_codec: String,
      fragmented: Boolean,
      n_fragments: Int)

  /** MP4 census metadata over the opaque media table — box walk only,
    * no entropy decode (see [[Mp4Meta]]); q251 hash-gates the plain
    * path, q259 the fragmented (moof/traf) one.
    */
  def decodeMp4Meta(media: Dataset[MediaRecord]): Dataset[Mp4MetaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        Mp4Meta.decode(m.data) match {
          case Right(s) =>
            Mp4MetaRow(m.media_id, ok = true, "", s.brand, s.minorVersion,
              s.timescale, s.durationMs, s.nTracks, s.width, s.height,
              s.videoCodec, s.audioCodec, s.fragmented, s.nFragments)
          case Left(e) =>
            Mp4MetaRow(m.media_id, ok = false, e, "", 0L, 0L, 0L, 0, 0, 0, "", "",
              fragmented = false, 0)
        }
      }
    }
  }

  /** Documents -> REAL MP4 containers, deterministically: movie
    * timescale (len%3+1)*1000 with duration (len%4000+40)*(len%3+1)
    * — so duration_ms is EXACTLY len%4000+40 — one avc1/hev1 video
    * track at (len%320+16) x (len%240+16), plus an mp4a audio track
    * when doc_id%3 == 0; brand isom/mp42 by parity, text bytes as
    * mdat. Every census field is a pure function of (doc_id, len) —
    * the q240 rule. Odd durations exercise the v1 mvhd/tkhd layouts.
    */
  def toMp4(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(length(col("text")) > 0)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("px"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val len = bytes.length
        val scaleK = len % 3 + 1
        val video = Mp4Meta.Mp4Track(
          "vide", if (id % 2 == 0) "avc1" else "hev1", 1L,
          len % 320 + 16, len % 240 + 16)
        val tracks =
          if (id % 3 == 0) Seq(video, Mp4Meta.Mp4Track("soun", "mp4a", 2L, 0, 0))
          else Seq(video)
        MediaRecord(id, "video", "mp4",
          Mp4Meta.encodeMp4(
            if (id % 2 == 0) "isom" else "mp42", id % 512,
            scaleK.toLong * 1000L, (len % 4000 + 40).toLong * scaleK,
            tracks, bytes))
      }
      .toDF()
  }

  /** Documents -> REAL FRAGMENTED MP4s (r20 — the DASH/CMAF layout
    * modern streaming origins actually serve), deterministically:
    * movie == media timescale (len%3+1)*1000, total duration ticks
    * (len%4000+40)*(len%3+1) — so duration_ms is EXACTLY len%4000+40
    * — split across len%3+2 moof/mdat fragments (base-size fragments,
    * remainder in the last). All three duration sources are
    * exercised: odd docs carry PER-SAMPLE trun durations (len%4+1
    * samples per fragment, flag 0x100), even docs the count x default
    * layout with tfhd defaults — except the LAST fragment, which
    * omits tfhd so the trex default must resolve it — and doc_id%4==0
    * adds mvex/mehd (which then wins). One avc1/hev1 video track at
    * (len%320+16) x (len%240+16), an mp4a audio track (init-segment
    * only, no fragments) when doc_id%3 == 0, text bytes split across
    * the mdats. Every census field is a pure function of
    * (doc_id, len) — the q240 rule.
    */
  def toMp4Fragmented(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(length(col("text")) > 0)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("px"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val len = bytes.length
        val scaleK = len % 3 + 1
        val ts = scaleK.toLong * 1000L
        val totalTicks = (len % 4000 + 40).toLong * scaleK
        val nFrags = len % 3 + 2
        val base = totalTicks / nFrags
        val fragTicks = Seq.tabulate(nFrags)(i =>
          if (i < nFrags - 1) base else totalTicks - base * (nFrags - 1))
        val perSample = id % 2 == 1
        val frags = fragTicks.zipWithIndex.map { case (t, i) =>
          val mdat = java.util.Arrays.copyOfRange(bytes,
            i * len / nFrags, (i + 1) * len / nFrags)
          if (perSample) {
            val cnt = len % 4 + 1
            val durs = Seq.tabulate(cnt)(j => t / cnt + (if (j < t % cnt) 1L else 0L))
            Mp4Meta.Mp4Frag(1L, durs, perSample = true, tfhdDefault = false, mdat)
          } else Mp4Meta.Mp4Frag(1L, Seq(t), perSample = false,
            tfhdDefault = i < nFrags - 1, mdat)
        }
        val video = Mp4Meta.Mp4Track(
          "vide", if (id % 2 == 0) "avc1" else "hev1", 1L,
          len % 320 + 16, len % 240 + 16)
        val tracks =
          if (id % 3 == 0) Seq(video, Mp4Meta.Mp4Track("soun", "mp4a", 2L, 0, 0))
          else Seq(video)
        MediaRecord(id, "video", "mp4",
          Mp4Meta.encodeMp4Fragmented(
            if (id % 2 == 0) "dash" else "iso6", id % 256, ts, tracks,
            mediaTimescale = ts,
            trexDefaults = Map(1L -> fragTicks.last, 2L -> 0L),
            mehdDuration = if (id % 4 == 0) Some(totalTicks) else None,
            frags))
      }
      .toDF()
  }

  /** Documents -> STANDALONE DASH media segments (r20 — the shape a
    * DASH origin serves in volume: styp + sidx + moof/mdat pairs,
    * NO moov), deterministically: sidx timescale (len%3+1)*1000 with
    * summed reference durations (len%4000+40)*(len%3+1) — so
    * duration_ms is EXACTLY len%4000+40 — split across len%3+2
    * fragments; even docs the tfhd count x default trun layout, odd
    * docs per-sample durations (no trex exists — the init segment
    * isn't here, which is the POINT); brand msdh/msix by parity,
    * text bytes split across the mdats. Every field is a pure
    * function of (doc_id, len) — the q240 rule.
    */
  def toMp4Segment(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(length(col("text")) > 0)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("px"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val len = bytes.length
        val scaleK = len % 3 + 1
        val ts = scaleK.toLong * 1000L
        val totalTicks = (len % 4000 + 40).toLong * scaleK
        val nFrags = len % 3 + 2
        val base = totalTicks / nFrags
        val fragTicks = Seq.tabulate(nFrags)(i =>
          if (i < nFrags - 1) base else totalTicks - base * (nFrags - 1))
        val perSample = id % 2 == 1
        val frags = fragTicks.zipWithIndex.map { case (t, i) =>
          val mdat = java.util.Arrays.copyOfRange(bytes,
            i * len / nFrags, (i + 1) * len / nFrags)
          if (perSample) {
            val cnt = len % 4 + 1
            val durs = Seq.tabulate(cnt)(j => t / cnt + (if (j < t % cnt) 1L else 0L))
            Mp4Meta.Mp4Frag(1L, durs, perSample = true, tfhdDefault = false, mdat)
          } else Mp4Meta.Mp4Frag(1L, Seq(t), perSample = false,
            tfhdDefault = true, mdat)
        }
        MediaRecord(id, "video", "mp4",
          Mp4Meta.encodeMp4Segment(
            if (id % 2 == 0) "msdh" else "msix", id % 64, ts, fragTicks, frags))
      }
      .toDF()
  }

  /** Typed per-payload WebM/Matroska container metadata
    * ([[WebmMeta]]) with the standard error-channel shape.
    */
  final case class WebmMetaRow(
      media_id: Long,
      ok: Boolean,
      err: String,
      doc_type: String,
      timestamp_scale: Long,
      duration_ms: Long,
      n_tracks: Int,
      width: Int,
      height: Int,
      video_codec: String,
      audio_codec: String,
      audio_hz: Int,
      audio_channels: Int)

  /** WebM census metadata over the opaque media table — EBML walk
    * only, no entropy decode (see [[WebmMeta]]); q256 hash-gates the
    * path.
    */
  def decodeWebmMeta(media: Dataset[MediaRecord]): Dataset[WebmMetaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        WebmMeta.decode(m.data) match {
          case Right(s) =>
            WebmMetaRow(m.media_id, ok = true, "", s.docType, s.timestampScale,
              s.durationMs, s.nTracks, s.width, s.height, s.videoCodec,
              s.audioCodec, s.audioHz, s.audioChannels)
          case Left(e) =>
            WebmMetaRow(m.media_id, ok = false, e, "", 0L, 0L, 0, 0, 0, "", "", 0, 0)
        }
      }
    }
  }

  /** Documents -> REAL WebM containers, deterministically: timestamp
    * scale alternates 1 ms / 0.5 ms ticks with len parity (duration
    * ticks scaled so duration_ms is EXACTLY len%4000+40 either way),
    * a V_VP9/V_VP8 video track at (len%640+16) x (len%360+16), an
    * A_OPUS 48 kHz track when doc_id%3 == 0, the streaming-muxer
    * unknown Segment size on every fifth record, text bytes as the
    * Cluster. Every SEVENTH record (r20) is live-muxed: no
    * Info/Duration, the Cluster carrying a Timestamp of ticks-3 and
    * SimpleBlocks at +1/+3 — so the last-cluster fallback recovers
    * EXACTLY the same duration_ms and the q256 oracle is untouched.
    * Every census field is a pure function of (doc_id, len) — the
    * q240 rule.
    */
  def toWebm(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(length(col("text")) > 0)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("px"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val len = bytes.length
        val scale = (len % 2 + 1) * 500000L // 0.5 ms or 1 ms ticks
        val durMs = (len % 4000 + 40).toLong
        val ticks = durMs * 1000000.0 / scale
        val video = WebmMeta.WebmTrack(1,
          if (id % 2 == 0) "V_VP9" else "V_VP8",
          width = len % 640 + 16, height = len % 360 + 16)
        val tracks =
          if (id % 3 == 0)
            Seq(video, WebmMeta.WebmTrack(2, "A_OPUS", hz = 48000,
              channels = (id % 2 + 1).toInt))
          else Seq(video)
        val live = id % 7 == 0
        val ticksL = durMs * 1000000L / scale // exact: scale divides 1e6
        MediaRecord(id, "video", "webm",
          WebmMeta.encodeWebm(scale, ticks, tracks, bytes,
            unknownSegmentSize = id % 5 == 0,
            omitDuration = live,
            clusterTimestamp = if (live) ticksL - 3 else 0L,
            blockRelTimes = if (live) Seq(1, 3) else Nil))
      }
      .toDF()
  }

  /** Typed per-stream stats from [[VideoCodec]]'s real Y4M decode,
    * with the same error-channel shape as [[ImageFeatures]].
    */
  final case class VideoFeatures(
      media_id: Long,
      codec: String,
      ok: Boolean,
      err: String,
      width: Int,
      height: Int,
      fps_num: Int,
      fps_den: Int,
      colorspace: String,
      n_frames: Long,
      duration_ms: Long,
      y_mean: Double,
      y_min: Int,
      y_max: Int)

  /** REAL video decode over the opaque media table — the video
    * sibling of [[decodeImages]]/[[decodeAudio]] for uncompressed
    * YUV4MPEG2 streams; q111 hash-gates the whole path (stream header
    * parse, FRAME walk, plane geometry, luma sample scan) against a
    * DuckDB oracle recomputing the stats from the source bytes.
    * Compressed codecs stay byte-profiled (see [[decodeFeatures]]).
    */
  def decodeVideo(media: Dataset[MediaRecord]): Dataset[VideoFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        VideoCodec.decode(m.data) match {
          case Right(v) =>
            VideoFeatures(m.media_id, v.codec, ok = true, "", v.width, v.height,
              v.fpsNum, v.fpsDen, v.colorspace, v.nFrames, v.durationMs,
              v.yMean, v.yMin, v.yMax)
          case Left(e) =>
            VideoFeatures(m.media_id, "", ok = false, e, 0, 0, 0, 0, "", 0L, 0L, 0d, 0, 0)
        }
      }
    }
  }

  final case class SceneCutRow(
      media_id: Long,
      ok: Boolean,
      err: String,
      frame: Long,
      delta_ppm: Long,
      is_cut: Boolean)

  /** Shot-boundary (scene-cut) detection over decoded video — the
    * video-curation operator a multimodal pipeline runs before frame
    * sampling (sample WITHIN shots, not across them): per frame
    * transition the exact mean absolute luma delta in ppm of the 255
    * maximum ([[VideoCodec.sceneDeltas]] — single pass, two planes of
    * memory), flagged a cut at `thresholdPpm`. One row per TRANSITION
    * (frame = the later frame's index); single-frame videos emit
    * nothing; undecodable payloads emit one error row — the Warc
    * degradation rule, never a task failure. Map-only (mapPartitions
    * + one explode), no shuffle.
    */
  def sceneCuts(
      media: Dataset[MediaRecord],
      thresholdPpm: Long): Dataset[SceneCutRow] = {
    require(thresholdPpm >= 0 && thresholdPpm <= 1000000L,
      s"thresholdPpm must be a ppm fraction, got $thresholdPpm")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        VideoCodec.sceneDeltas(m.data) match {
          case Right(ds) => ds.iterator.map(d =>
            SceneCutRow(m.media_id, ok = true, "", d.frame, d.deltaPpm,
              d.deltaPpm >= thresholdPpm))
          case Left(e) =>
            Iterator.single(SceneCutRow(m.media_id, ok = false, e, -1L, 0L,
              is_cut = false))
        }
      }
    }
  }

  final case class SilenceRow(
      media_id: Long,
      ok: Boolean,
      err: String,
      window: Long,
      n_samples: Long,
      dev_ppm: Long,
      silent: Boolean)

  /** Energy-based silence/VAD segmentation over decoded audio — the
    * audio-curation twin of [[sceneCuts]] (trim silence before
    * transcription, drop dead air from training clips): fixed-size
    * sample windows, per window the exact mean absolute deviation
    * from the zero line in ppm of full scale
    * ([[AudioCodec.windowEnergies]] — single pass, O(1) memory),
    * flagged silent under `thresholdPpm`. One row per window;
    * undecodable payloads degrade to one error row. Map-only.
    */
  def silenceSegments(
      media: Dataset[MediaRecord],
      winSamples: Int,
      thresholdPpm: Long): Dataset[SilenceRow] = {
    require(thresholdPpm >= 0 && thresholdPpm <= 1000000L,
      s"thresholdPpm must be a ppm fraction, got $thresholdPpm")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        AudioCodec.windowEnergies(m.data, winSamples) match {
          case Right(ws) => ws.iterator.map(w =>
            SilenceRow(m.media_id, ok = true, "", w.window, w.n, w.devPpm,
              w.devPpm < thresholdPpm))
          case Left(e) =>
            Iterator.single(SilenceRow(m.media_id, ok = false, e, -1L, 0L, 0L,
              silent = false))
        }
      }
    }
  }

  /** Little-endian unsigned int of `bytes` width as a binary column —
    * the RIFF header building block for [[toWav]].
    */
  private def le(c: Column, bytes: Int): Column =
    unhex(concat((0 until bytes).map(b =>
      format_string("%02X", pmod(shiftright(c.cast("long"), 8 * b), lit(256)))): _*))

  /** Documents -> REAL mono 8-bit PCM WAV payloads, deterministically:
    * a spec-complete RIFF/WAVE container (fmt + data chunks, correct
    * sizes) whose samples are the text bytes and whose sample rate is
    * len%4000+4000. Like [[toPpm]], this is what lets q103 hash-gate
    * a REAL binary audio decode against a DuckDB oracle recovering
    * every sample as a codepoint — the parser must walk the chunks
    * and land on the data offset exactly or the stats diverge.
    */
  def toWav(docs: DataFrame): DataFrame = {
    val len = length(col("text"))
    docs.filter(len > 0)
      .withColumn("rate", (pmod(len, lit(4000)) + lit(4000)).cast("int"))
      .select(
        col("doc_id").as("media_id"),
        lit("audio").as("kind"),
        lit("wav").as("format"),
        concat(
          encode(lit("RIFF"), "UTF-8"), le(length(col("text")) + lit(36), 4),
          encode(lit("WAVE"), "UTF-8"),
          encode(lit("fmt "), "UTF-8"), le(lit(16), 4),
          le(lit(1), 2), // PCM
          le(lit(1), 2), // mono
          le(col("rate"), 4),
          le(col("rate"), 4), // byte rate = rate * 1 channel * 1 byte
          le(lit(1), 2), // block align
          le(lit(8), 2), // bits per sample
          encode(lit("data"), "UTF-8"), le(length(col("text")), 4),
          encode(col("text"), "UTF-8")).as("data"))
  }

  /** Documents -> REAL FLAC payloads: the SAME mono 8-bit sample
    * stream as [[toWav]] (text bytes — all-ASCII, so every sample is
    * non-negative in FLAC's signed domain and equals its codepoint),
    * losslessly compressed by [[FlacCodec.encodeFlac]] with the fixed
    * predictor order rotating by doc_id % 5 (all five orders on every
    * sweep) and a 192-sample block size (both the 8-bit and 16-bit
    * block-size-at-end header forms appear: full blocks ride the
    * 8-bit code, and doc lengths are not multiples of 192, so short
    * tail frames ride it too). FLAC is lossless, so the q237 oracle
    * is q103's: every stat re-derived from the text.
    */
  def toFlac(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val len = length(col("text"))
    docs.filter(len > 0)
      .select(col("doc_id"),
        (pmod(len, lit(4000)) + lit(4000)).cast("int").as("rate"),
        encode(col("text"), "UTF-8").as("px"))
      .as[(Long, Int, Array[Byte])]
      .map { case (id, rate, bytes) =>
        MediaRecord(id, "audio", "flac",
          FlacCodec.encodeFlac(bytes.map(b => (b & 0xff): Int), channels = 1,
            rate = rate, bits = 8, blockSize = 192, fixedOrder = (id % 5).toInt))
      }
      .toDF()
  }

  /** Documents -> REAL P6 PPM payloads, deterministically: for text of
    * byte length L, a (L%8+1) x (L%6+1) RGB image whose raster is the
    * text repeated/truncated to fill 3*w*h bytes, behind a spec-exact
    * "P6\nw h\n255\n" header. The corpus is all-ASCII (asserted by the
    * q35/q44 hash gates), so the DuckDB oracle can recover every pixel
    * byte as a codepoint — which is what lets q102 hash-gate a REAL
    * binary image decode end-to-end on driver-provided data.
    */
  def toPpm(docs: DataFrame): DataFrame = {
    val len = length(col("text"))
    docs.filter(len > 0)
      .withColumn("w", (pmod(len, lit(8)) + lit(1)).cast("int"))
      .withColumn("h", (pmod(len, lit(6)) + lit(1)).cast("int"))
      .withColumn("npx", col("w") * col("h") * lit(3))
      .select(
        col("doc_id").as("media_id"),
        lit("image").as("kind"),
        lit("ppm").as("format"),
        encode(concat(
          format_string("P6\n%d %d\n255\n", col("w"), col("h")),
          expr("substring(repeat(text, cast(ceil(cast(npx as double) / length(text)) as int)), 1, npx)")),
          "UTF-8").as("data"))
  }

  /** Documents -> REAL lossless WebP (VP8L) payloads: the SAME pixel
    * geometry and bytes as [[toPpm]]/[[toPng]] — a (L%8+1) x (L%6+1)
    * RGB raster of the text repeated/truncated — re-containered as a
    * genuine VP8L bitstream ([[WebpCodec.encodeWebpLossless]]: RIFF
    * walk, 14-bit header, flat canonical codes transmitted through
    * the real code-length-code + max_symbol path, 0-bit degenerate
    * trees). Lossless, so the q233 oracle recomputes every stat from
    * the text exactly as q102/q216 do — and the shared raster means
    * cross-format twins (ppm/png/webp of one doc) pair at hamming 0.
    */
  def toWebp(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val len = length(col("text"))
    docs.filter(len > 0)
      .withColumn("w", (pmod(len, lit(8)) + lit(1)).cast("int"))
      .withColumn("h", (pmod(len, lit(6)) + lit(1)).cast("int"))
      .withColumn("npx", col("w") * col("h") * lit(3))
      .select(col("doc_id"), col("w"), col("h"),
        encode(expr("substring(repeat(text, cast(ceil(cast(npx as double) / length(text)) as int)), 1, npx)"),
          "UTF-8").as("px"))
      .as[(Long, Int, Int, Array[Byte])]
      .map { case (id, w, h, px) =>
        MediaRecord(id, "image", "webp", WebpCodec.encodeWebpLossless(px, w, h))
      }
      .toDF()
  }

  /** Documents -> REAL baseline TIFF payloads: the SAME raster as
    * [[toPpm]] (a (L%8+1) x (L%6+1) RGB image of the text bytes),
    * re-containered by [[TiffCodec.encodeTiff]] with the compression
    * rotating doc_id % 3 through none / LZW+Predictor-2 / PackBits,
    * 2-row strips (multi-strip on every raster taller than 2), and
    * the byte order alternating II/MM by doc parity. Lossless, so the
    * q249 oracle recomputes every stat from the text (q102's rule).
    * Every third record (r20) carries a GPS IFD in its OWN IFD0 —
    * [[ExifGps.tiffWithGps]], the jpeg adapter's coordinate rule —
    * completing the media-PII matrix's tiff row; the appended-IFD
    * graft leaves the raster bytes and stats untouched.
    */
  def toTiff(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val len = length(col("text"))
    docs.filter(len > 0)
      .withColumn("w", (pmod(len, lit(8)) + lit(1)).cast("int"))
      .withColumn("h", (pmod(len, lit(6)) + lit(1)).cast("int"))
      .withColumn("npx", col("w") * col("h") * lit(3))
      .select(col("doc_id"), col("w"), col("h"),
        encode(expr("substring(repeat(text, cast(ceil(cast(npx as double) / length(text)) as int)), 1, npx)"),
          "UTF-8").as("px"))
      .as[(Long, Int, Int, Array[Byte])]
      .map { case (id, w, h, px) =>
        val (compression, predictor) = (id % 3) match {
          case 0 => (1, 1)
          case 1 => (5, 2)
          case _ => (32773, 1)
        }
        // r19: every fourth record rides the TILED layout (same
        // pixels, so the q249 text-derived oracle is untouched while
        // the tile walk gets hash-gated; predictor stays 1 there)
        val base =
          if (id % 4 == 3)
            TiffCodec.encodeTiffTiled(px, w, h, spp = 3,
              compression = compression, littleEndian = id % 2 == 0)
          else
            TiffCodec.encodeTiff(px, w, h, spp = 3, compression = compression,
              predictor = predictor, rowsPerStrip = 2, littleEndian = id % 2 == 0)
        MediaRecord(id, "image", "tiff",
          if (id % 3 == 0)
            ExifGps.tiffWithGps(base,
              if (id % 2 == 0) "N" else "S",
              if ((id / 2) % 2 == 0) "E" else "W",
              id % 324000, (id * 7) % 648000)
          else base)
      }
      .toDF()
  }

  /** Documents -> REAL tiled palette-color TIFFs (r19),
    * deterministically: a (L%40+17) x (L%24+17) photometric-3 raster
    * — multiple 16x16 tiles with padded edges — whose INDICES are the
    * text bytes repeated/truncated, under the IDENTITY colormap
    * (entry i = (i,i,i) x257), so every decoded channel equals the
    * source byte and the q254 oracle recomputes all three means,
    * min/max, and the dims from the text alone. Even docs strip-
    * layout palette (single strip), odd docs tiled; compression
    * rotates doc_id % 3; byte order alternates (doc_id/2) % 2.
    */
  def toTiffPalette(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val len = length(col("text"))
    docs.filter(len > 0)
      .withColumn("w", (pmod(len, lit(40)) + lit(17)).cast("int"))
      .withColumn("h", (pmod(len, lit(24)) + lit(17)).cast("int"))
      .withColumn("npx", col("w") * col("h"))
      .select(col("doc_id"), col("w"), col("h"),
        encode(expr("substring(repeat(text, cast(ceil(cast(npx as double) / length(text)) as int)), 1, npx)"),
          "UTF-8").as("px"))
      .as[(Long, Int, Int, Array[Byte])]
      .map { case (id, w, h, px) =>
        val identity = Array.tabulate(768)(i => i % 256)
        val compression = (id % 3) match {
          case 1 => 5
          case 2 => 32773
          case _ => 1
        }
        val le = (id / 2) % 2 == 0
        MediaRecord(id, "image", "tiff",
          if (id % 2 == 1)
            TiffCodec.encodeTiffTiled(px, w, h, spp = 1, colormap = identity,
              compression = compression, littleEndian = le)
          else
            TiffCodec.encodeTiffStripPalette(px, w, h, identity,
              compression = compression, rowsPerStrip = 5, littleEndian = le))
      }
      .toDF()
  }

  /** Documents -> REAL PNG payloads, deterministically: SAME pixel
    * geometry and bytes as [[toPpm]] — a (L%8+1) x (L%6+1) RGB raster
    * of the text repeated/truncated — re-containered as a genuine
    * 8-bit RGB non-interlaced PNG ([[ImageCodec.encodePng]]): per-row
    * filter type cycling through all five PNG filters, zlib DEFLATE,
    * multi-chunk IDAT, CRC'd chunks. The oracle never parses the PNG;
    * it recomputes the stats from the text exactly as q102's does
    * (pixel byte == codepoint on the all-ASCII corpus), so the q216
    * gate pins the whole ENCODE -> DECODE round trip — filter
    * inversion, streaming inflate, chunk CRC walk — against
    * text-derived ground truth, on crawl-real image bytes.
    */
  def toPng(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val len = length(col("text"))
    docs.filter(len > 0)
      .withColumn("w", (pmod(len, lit(8)) + lit(1)).cast("int"))
      .withColumn("h", (pmod(len, lit(6)) + lit(1)).cast("int"))
      .withColumn("npx", col("w") * col("h") * lit(3))
      .select(col("doc_id"), col("w"), col("h"),
        encode(expr("substring(repeat(text, cast(ceil(cast(npx as double) / length(text)) as int)), 1, npx)"),
          "UTF-8").as("px"))
      .as[(Long, Int, Int, Array[Byte])]
      .map { case (id, w, h, px) =>
        MediaRecord(id, "image", "png", ImageCodec.encodePng(px, w, h))
      }
      .toDF()
  }

  /** The fixed 256-entry palette [[toPngVariants]] encodes with:
    * index i maps to (i, 2i mod 256, 7i mod 256) — a bijection on the
    * red channel, so the oracle recovers every mapped sample from the
    * source byte with integer arithmetic.
    */
  private val VariantPalette: Array[Byte] = Array.tabulate(768) { j =>
    val i = j / 3
    (j % 3 match {
      case 0 => i
      case 1 => (2 * i) % 256
      case _ => (7 * i) % 256
    }).toByte
  }

  /** Documents -> the OTHER real PNG shapes a crawl carries in volume,
    * deterministically FOUR records per doc: an 8-bit PLTE-INDEXED
    * image (media_id 4·doc_id; indices are the text bytes over a
    * (L%8+1) x (L%6+1) grid, palette [[VariantPalette]]), a 16-BIT
    * grayscale image (media_id 4·doc_id+1; samples byte·257 — the
    * exact 8→16-bit scale expansion), an Adam7-INTERLACED RGB image
    * (media_id 4·doc_id+2; the [[toPpm]] raster re-containered
    * through the seven-pass layout), and a 4-BIT indexed image
    * (media_id 4·doc_id+3; indices byte mod 16 through the packed-bit
    * path). Same trick as [[toPpm]]: the all-ASCII corpus lets the
    * q226 DuckDB oracle recover every palette index / sample from a
    * codepoint, so the gate pins the PLTE lookup, the big-endian pair
    * read, the bpp-stride unfilter, the Adam7 pass walk, and the
    * sub-byte bit unpack, end-to-end on driver data.
    */
  def toPngVariants(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val len = length(col("text"))
    docs.filter(len > 0)
      .withColumn("w", (pmod(len, lit(8)) + lit(1)).cast("int"))
      .withColumn("h", (pmod(len, lit(6)) + lit(1)).cast("int"))
      .withColumn("npx", col("w") * col("h"))
      .select(col("doc_id"), col("w"), col("h"),
        encode(expr("substring(repeat(text, cast(ceil(cast(npx as double) / length(text)) as int)), 1, npx)"),
          "UTF-8").as("px"),
        encode(expr("substring(repeat(text, cast(ceil(cast(3 * npx as double) / length(text)) as int)), 1, 3 * npx)"),
          "UTF-8").as("px3"))
      .as[(Long, Int, Int, Array[Byte], Array[Byte])]
      .flatMap { case (id, w, h, px, px3) =>
        Seq(
          MediaRecord(4 * id, "image", "png",
            ImageCodec.encodePngIndexed(px, VariantPalette, w, h)),
          MediaRecord(4 * id + 1, "image", "png",
            ImageCodec.encodePngGray16(px.map(b => (b & 0xff) * 257), w, h)),
          MediaRecord(4 * id + 2, "image", "png",
            ImageCodec.encodePngAdam7(px3, w, h)),
          MediaRecord(4 * id + 3, "image", "png",
            ImageCodec.encodePngIndexed(px.map(b => ((b & 0xff) % 16).toByte),
              java.util.Arrays.copyOf(VariantPalette, 48), w, h, depth = 4)))
      }
      .toDF()
  }

  /** Documents -> REAL GIF89a payloads, deterministically: indices
    * are the text bytes mod 16 over a (L%8+1) x (L%6+1) grid through
    * the [[VariantPalette]] 16-entry prefix; odd docs INTERLACED (the
    * four-pass row order). GIF is lossless on palette indices, so
    * q230 hash-gates the LSB-first LZW decode, width schedule, and
    * pass walk against stats the oracle re-derives from the text
    * (byte == codepoint).
    */
  def toGif(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val len = length(col("text"))
    docs.filter(len > 0)
      .withColumn("w", (pmod(len, lit(8)) + lit(1)).cast("int"))
      .withColumn("h", (pmod(len, lit(6)) + lit(1)).cast("int"))
      .withColumn("npx", col("w") * col("h"))
      .select(col("doc_id"), col("w"), col("h"),
        encode(expr("substring(repeat(text, cast(ceil(cast(npx as double) / length(text)) as int)), 1, npx)"),
          "UTF-8").as("px"))
      .as[(Long, Int, Int, Array[Byte])]
      .map { case (id, w, h, px) =>
        MediaRecord(id, "image", "gif",
          GifCodec.encodeGif(px.map(b => ((b & 0xff) % 16).toByte),
            java.util.Arrays.copyOf(VariantPalette, 48), w, h,
            interlaced = id % 2 == 1))
      }
      .toDF()
  }

  /** Documents -> REAL baseline JPEGs, deterministically — and still
    * EXACTLY oracle-checkable despite JPEG being lossy: the raster is
    * FLAT TILES (every 8x8 — or 16x16 for the 4:2:0 color variant —
    * block carries one value), and with unit quantization a flat
    * block is DC-only, which the DCT round trip reproduces
    * bit-exactly (JpegCodecSpec pins this). Tile (L%3+1) x (L%2+1)
    * grids valued by the text bytes; even doc_id -> grayscale SOF
    * (8px tiles, every 4th with DRI/RST restarts so the restart path
    * sits on the oracle gate), odd -> color 4:2:0 (16px tiles; gray
    * tiles keep Cb=Cr=128 exact through the chroma average). q227
    * hash-gates the full marker walk, Huffman decode, IDCT and both
    * MCU layouts against text-derived ground truth.
    */
  def toJpeg(docs: DataFrame): DataFrame = toJpegImpl(docs, progressive = false)

  /** [[toJpeg]]'s PROGRESSIVE (SOF2) twin — same flat-tile rasters,
    * same exactness argument (successive approximation transmits
    * every coefficient bit, so DC-only blocks reconstruct exactly),
    * encoded through the multi-scan spectral-selection + successive-
    * approximation script. q229 hash-gates the progressive decode
    * path — DC first/refine, AC band scans, EOBRUN, the refinement
    * correction-bit walk — against the same text-derived oracle.
    */
  def toJpegProgressive(docs: DataFrame): DataFrame = toJpegImpl(docs, progressive = true)

  private def toJpegImpl(docs: DataFrame, progressive: Boolean): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val len = length(col("text"))
    docs.filter(len > 0)
      .withColumn("tw", (pmod(len, lit(3)) + lit(1)).cast("int"))
      .withColumn("th", (pmod(len, lit(2)) + lit(1)).cast("int"))
      .withColumn("nt", col("tw") * col("th"))
      .select(col("doc_id"), col("tw"), col("th"),
        encode(expr("substring(repeat(text, cast(ceil(cast(nt as double) / length(text)) as int)), 1, nt)"),
          "UTF-8").as("px"))
      .as[(Long, Int, Int, Array[Byte])]
      .map { case (id, tw, th, vals) =>
        def raster(tile: Int): Array[Byte] = {
          val w = tw * tile
          Array.tabulate(w * th * tile) { k =>
            vals(((k / w) / tile) * tw + (k % w) / tile)
          }
        }
        // every record carries an Exif APP1 orientation tag (r18):
        // the value rotates doc_id % 7 + 1 so the census gates the
        // APP1/TIFF parse; pixel stats are orientation-invariant, so
        // every stats oracle is untouched. Every THIRD record's APP1
        // also carries a GPS IFD (r19 — deterministic D-M-S
        // coordinates, see ExifGps) so the census gates the
        // media-layer PII surface too.
        val ori = (id % 7 + 1).toInt
        val base =
          if (id % 2 == 0) {
            val g = raster(8)
            if (progressive) JpegCodec.encodeJpegProgressiveGray(g, 8 * tw, 8 * th)
            else JpegCodec.encodeJpegGray(g, 8 * tw, 8 * th,
              restartInterval = if (id % 4 == 0) 2 else 0)
          } else {
            val rgb = raster(16).flatMap(v => Array(v, v, v))
            if (progressive)
              JpegCodec.encodeJpegProgressive(rgb, 16 * tw, 16 * th, subsample = true)
            else JpegCodec.encodeJpeg(rgb, 16 * tw, 16 * th, subsample = true)
          }
        val tagged =
          if (id % 3 == 0)
            ExifGps.withExifGps(base, ori,
              if (id % 2 == 0) "N" else "S",
              if ((id / 2) % 2 == 0) "E" else "W",
              id % 324000, (id * 7) % 648000)
          else JpegCodec.withExifOrientation(base, ori)
        MediaRecord(id, "image", "jpeg", tagged)
      }
      .toDF()
  }

  /** Documents -> REAL YUV4MPEG2 payloads, deterministically: for text
    * of byte length L, a (L%6+1) x (L%4+1) C444 stream of (L%3+1)
    * frames at 25 fps whose picture bytes are the text
    * repeated/truncated to fill nFrames*3*w*h, behind the spec-exact
    * stream header and per-frame `FRAME\n` markers. Same trick as
    * [[toPpm]]/[[toWav]]: the all-ASCII corpus lets the DuckDB oracle
    * recover every sample byte as a codepoint, so q111 hash-gates a
    * REAL binary video decode — a wrong frame offset, a misparsed
    * header tag, or bad plane geometry breaks the hash.
    */
  def toY4m(docs: DataFrame): DataFrame = {
    val len = length(col("text"))
    docs.filter(len > 0)
      .withColumn("w", (pmod(len, lit(6)) + lit(1)).cast("int"))
      .withColumn("h", (pmod(len, lit(4)) + lit(1)).cast("int"))
      .withColumn("nf", (pmod(len, lit(3)) + lit(1)).cast("int"))
      .withColumn("fsz", col("w") * col("h") * lit(3))
      .withColumn("total", col("fsz") * col("nf"))
      .withColumn("rep",
        expr("substring(repeat(text, cast(ceil(cast(total as double) / length(text)) as int)), 1, total)"))
      .select(
        col("doc_id").as("media_id"),
        lit("video").as("kind"),
        lit("y4m").as("format"),
        encode(concat(
          format_string("YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C444\n", col("w"), col("h")),
          array_join(
            transform(sequence(lit(0), col("nf") - 1), k =>
              concat(lit("FRAME\n"),
                col("rep").substr(k * col("fsz") + 1, col("fsz")))),
            "")),
          "UTF-8").as("data"))
  }

  /** Deterministic frame sampling: n evenly-spaced fixed-width byte
    * slices of the payload (the plumbing of video frame extraction:
    * same output schema, same explode shape a real demuxer would
    * produce). Pure Catalyst expressions — no UDF.
    */
  def sampleFrames(media: DataFrame, n: Int, frameBytes: Int): DataFrame = {
    val len = length(col("data"))
    val frames = transform(sequence(lit(0), lit(n - 1)), i => {
      val offset = floor(i * greatest(len - frameBytes, lit(0)) /
        lit(math.max(n - 1, 1))).cast("int")
      struct(i.as("frame_no"),
        offset.as("offset"),
        col("data").substr(offset + 1, lit(frameBytes)).as("frame"))
    })
    media.select(col("media_id"), col("kind"), explode(frames).as("f"))
      .select(col("media_id"), col("kind"),
        col("f.frame_no"), col("f.offset"), col("f.frame"))
  }

  /** Metadata "resize": pure plan-side transform a real pipeline uses to
    * propagate target dimensions to the decode stage (no byte work).
    */
  def withTargetSize(features: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim).cast("double") / greatest(col("width"), col("height")).cast("double"))
    features
      .withColumn("target_width", floor(col("width") * scale).cast("int"))
      .withColumn("target_height", floor(col("height") * scale).cast("int"))
  }
}
