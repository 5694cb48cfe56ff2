package graft.operators

/** Real video decoding for the multimodal column path — a
  * dependency-free YUV4MPEG2 (`.y4m`) parser, the video sibling of
  * [[ImageCodec]]/[[AudioCodec]]. Y4M is the standard UNCOMPRESSED
  * interchange format of the video toolchain (mjpegtools defined it;
  * ffmpeg/x264/VMAF all speak it): an ASCII stream header
  * (`YUV4MPEG2 W<w> H<h> F<num>:<den> [I? A? C<cs> X?]\n`) followed by
  * frames, each an ASCII `FRAME[ params]\n` marker plus exactly one
  * raw planar YUV picture. Compressed codecs (H.264 etc.) remain
  * env-out-of-scope byte-profiles — a dependency-free entropy decoder
  * is not a reasonable build — but container/stream parsing, frame
  * walking, plane geometry, and sample statistics are real here.
  *
  * Like the image/audio codecs, the decoder computes SUMMARY STATS in
  * one streaming pass — frame count, duration from the header rate,
  * and luma (Y-plane) mean/min/max across all frames — without
  * materializing any decoded frame buffer: O(1) memory per record at
  * any clip length. Malformed input is `Left(reason)`, never an
  * exception (the [[Media.decodeVideo]] error-channel surface).
  *
  * The video surface splits in two deliberately (r19): THIS decoder
  * reads uncompressed y4m sample data for real pixel statistics,
  * while [[Mp4Meta]] reads the COMPRESSED-video container layer —
  * duration, track geometry, codec fourccs from the ISO-BMFF box
  * structure, never the entropy-coded samples (the same
  * metadata-only rule [[Mp3Meta]]/[[OggMeta]] apply to compressed
  * audio, and the same information ffprobe surfaces without a
  * decoder). A census therefore gets durations and dimensions for
  * the dominant crawl video format AND exact luma stats where the
  * samples are actually decodable.
  */
object VideoCodec {

  /** Single-pass summary of a decoded Y4M stream. Luma stats are over
    * every frame's Y plane (full-resolution in all colorspaces).
    */
  final case class VideoStats(
      codec: String, // y4m
      width: Int,
      height: Int,
      fpsNum: Int,
      fpsDen: Int,
      colorspace: String, // C420 | C420jpeg | C420mpeg2 | C420paldv | C422 | C444
      nFrames: Long,
      durationMs: Long,
      yMean: Double,
      yMin: Int,
      yMax: Int)

  private val Magic = "YUV4MPEG2 ".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** True when the payload starts with the YUV4MPEG2 stream magic. */
  def sniff(data: Array[Byte]): Boolean =
    data.length >= Magic.length && {
      var i = 0
      while (i < Magic.length && data(i) == Magic(i)) i += 1
      i == Magic.length
    }

  /** Bytes of one frame picture for a colorspace, or -1 if the
    * colorspace/dimension combination is invalid. Chroma geometry per
    * the y4m spec: 420 quarter-size (even dims required), 422
    * half-width (even width), 444 full.
    */
  private def frameBytes(cs: String, w: Int, h: Int): Long = cs match {
    case "C444" => 3L * w * h
    case "C422" => if (w % 2 == 0) w.toLong * h * 2L else -1L
    case "C420" | "C420jpeg" | "C420mpeg2" | "C420paldv" =>
      if (w % 2 == 0 && h % 2 == 0) w.toLong * h + 2L * (w / 2) * (h / 2) else -1L
    case _ => -1L
  }

  private final case class Y4mHeader(
      w: Int, h: Int, fn: Int, fd: Int, cs: String, fb: Long, bodyPos: Int)

  /** Stream-header parse shared by [[decode]] and [[sceneDeltas]]:
    * magic check, tag walk, geometry/frame-rate validation.
    */
  private def parseHeader(d: Array[Byte]): Either[String, Y4mHeader] = {
    if (!sniff(d)) return Left("y4m: not a YUV4MPEG2 payload")
    // stream header: ASCII through the first 0x0A
    var nl = Magic.length
    while (nl < d.length && d(nl) != 0x0a) nl += 1
    if (nl >= d.length) return Left("y4m: unterminated stream header")
    val header = new String(d, Magic.length, nl - Magic.length,
      java.nio.charset.StandardCharsets.US_ASCII)
    var w = -1
    var h = -1
    var fn = -1
    var fd = -1
    var cs = "C420" // the spec default when no C tag is present
    for (tag <- header.split(' ') if tag.nonEmpty) tag.charAt(0) match {
      case 'W' => w = tag.drop(1).toIntOption.getOrElse(-1)
      case 'H' => h = tag.drop(1).toIntOption.getOrElse(-1)
      case 'F' => tag.drop(1).split(':') match {
        case Array(a, b) =>
          fn = a.toIntOption.getOrElse(-1); fd = b.toIntOption.getOrElse(-1)
        case _ => ()
      }
      case 'C' => cs = tag
      case 'I' | 'A' | 'X' => () // interlacing / aspect / extensions: ignored
      case c => return Left(s"y4m: unknown header tag '$c'")
    }
    if (w <= 0 || h <= 0) return Left(s"y4m: bad dimensions ${w}x$h")
    if (fn <= 0 || fd <= 0) return Left(s"y4m: bad frame rate $fn:$fd")
    val fb = frameBytes(cs, w, h)
    if (fb < 0) return Left(s"y4m: colorspace $cs invalid for ${w}x$h")
    Right(Y4mHeader(w, h, fn, fd, cs, fb, nl + 1))
  }

  /** Decode a Y4M payload to its summary stats, or a parse-failure
    * reason.
    */
  def decode(d: Array[Byte]): Either[String, VideoStats] = {
    val hd = parseHeader(d) match {
      case Left(e) => return Left(e)
      case Right(x) => x
    }
    val (w, h, fn, fd, cs, fb) = (hd.w, hd.h, hd.fn, hd.fd, hd.cs, hd.fb)
    val nl = hd.bodyPos - 1
    val ySize = w * h

    // frame walk: "FRAME"[ params]\n + fb payload bytes, to stream end
    var pos = nl + 1
    var frames = 0L
    var ySum = 0L
    var yMin = Int.MaxValue
    var yMax = Int.MinValue
    while (pos < d.length) {
      if (pos + 5 > d.length || d(pos) != 'F' || d(pos + 1) != 'R' ||
          d(pos + 2) != 'A' || d(pos + 3) != 'M' || d(pos + 4) != 'E')
        return Left(s"y4m: expected FRAME marker at byte $pos")
      var e = pos + 5
      while (e < d.length && d(e) != 0x0a) e += 1 // frame params: skipped
      if (e >= d.length) return Left("y4m: unterminated FRAME header")
      val body = e + 1
      if (body + fb > d.length)
        return Left(s"y4m: truncated frame ${frames + 1} — need $fb bytes, " +
          s"have ${d.length - body}")
      // luma plane is the first w*h bytes of every picture
      var i = 0
      while (i < ySize) {
        val v = d(body + i) & 0xff
        ySum += v
        if (v < yMin) yMin = v
        if (v > yMax) yMax = v
        i += 1
      }
      frames += 1
      pos = body + fb.toInt
    }
    if (frames == 0) return Left("y4m: no frames")
    Right(VideoStats("y4m", w, h, fn, fd, cs, frames,
      frames * 1000L * fd / fn, ySum.toDouble / (frames * ySize), yMin, yMax))
  }

  /** One frame TRANSITION's luma difference: `frame` is the index of
    * the LATER frame (1-based transition k−1 → k), `deltaPpm` the
    * mean absolute per-pixel luma delta normalized to ppm of the
    * 255 maximum — (Σ|Δ| · 10⁶) DIV (255 · w · h), truncating.
    */
  final case class SceneDelta(frame: Long, deltaPpm: Long)

  /** Per-transition luma deltas — the scene-CUT detector's substrate
    * (the standard shot-boundary heuristic: a transition whose mean
    * absolute luma delta clears a threshold is a cut; gradual fades
    * need windowed variants). Single pass, two luma planes of memory
    * (previous + current), exact integer arithmetic throughout so the
    * q201 oracle re-derives every delta from the source bytes.
    * Single-frame streams return an empty list (no transitions).
    */
  def sceneDeltas(d: Array[Byte]): Either[String, Seq[SceneDelta]] = {
    val hd = parseHeader(d) match {
      case Left(e) => return Left(e)
      case Right(x) => x
    }
    val ySize = hd.w * hd.h
    var pos = hd.bodyPos
    var frames = 0L
    var prev: Array[Int] = null
    var cur = new Array[Int](ySize)
    val out = scala.collection.mutable.ArrayBuffer.empty[SceneDelta]
    while (pos < d.length) {
      if (pos + 5 > d.length || d(pos) != 'F' || d(pos + 1) != 'R' ||
          d(pos + 2) != 'A' || d(pos + 3) != 'M' || d(pos + 4) != 'E')
        return Left(s"y4m: expected FRAME marker at byte $pos")
      var e = pos + 5
      while (e < d.length && d(e) != 0x0a) e += 1
      if (e >= d.length) return Left("y4m: unterminated FRAME header")
      val body = e + 1
      if (body + hd.fb > d.length)
        return Left(s"y4m: truncated frame ${frames + 1} — need ${hd.fb} " +
          s"bytes, have ${d.length - body}")
      var i = 0
      while (i < ySize) { cur(i) = d(body + i) & 0xff; i += 1 }
      if (prev != null) {
        var s = 0L
        var j = 0
        while (j < ySize) { s += math.abs(cur(j) - prev(j)); j += 1 }
        out += SceneDelta(frames, (s * 1000000L) / (255L * ySize))
      }
      val t = prev; prev = cur
      cur = if (t == null) new Array[Int](ySize) else t
      frames += 1
      pos = body + hd.fb.toInt
    }
    if (frames == 0) return Left("y4m: no frames")
    Right(out.toSeq)
  }
}
