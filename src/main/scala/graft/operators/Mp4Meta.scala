package graft.operators

/** MP4 / ISO-BMFF container metadata — video is the dominant crawl
  * media type by bytes, and a training pipeline needs duration, track
  * geometry, and codec identification WITHOUT an entropy decode (the
  * ffprobe rule the [[Mp3Meta]]/[[OggMeta]] siblings already follow):
  * everything here lives in the container's own box structure
  * (ISO/IEC 14496-12), so the walk is a pure byte scan.
  *
  * IN scope:
  *  - box framing: 32-bit big-endian size + fourcc, 64-bit largesize
  *    (size == 1), size == 0 ("to end of file", legal only for the
  *    final top-level box), strict child-inside-parent bounds
  *  - ftyp: major brand + minor version (the file MUST lead with it
  *    in this profile — the spec wants it "as early as possible")
  *  - moov/mvhd versions 0 and 1: movie timescale + duration;
  *    duration_ms = duration * 1000 / timescale, truncating
  *  - per-trak: tkhd v0/v1 (track id, 16.16 fixed-point presentation
  *    width/height — integer part surfaced), mdia/hdlr handler type
  *    (vide / soun), mdia/minf/stbl/stsd first-entry sample format
  *    (the codec fourcc: avc1, hev1, mp4a, ...)
  *  - first video track and first audio track surfaced; every track
  *    counted
  *
  * OUT of scope (named Lefts): fragmented movies (moof/mvex —
  * durations live in segment indexes there), mvhd/tkhd versions > 1,
  * encrypted boxes, and files whose first box is not ftyp. The
  * actual sample data (mdat) is never touched.
  *
  * Malformed input is a Left, never an exception. The independent
  * python fixture (scripts/gen_mp4_fixture.py) pins the walk.
  */
object Mp4Meta {

  final case class Mp4Stats(
      brand: String,
      minorVersion: Long,
      timescale: Long,
      durationMs: Long,
      nTracks: Int,
      width: Int, // first vide track, integer part of 16.16
      height: Int,
      videoCodec: String, // "" when no vide track
      audioCodec: String) // "" when no soun track

  def sniff(d: Array[Byte]): Boolean =
    d.length >= 12 && d(4) == 'f' && d(5) == 't' && d(6) == 'y' && d(7) == 'p'

  private final case class Abort(msg: String) extends RuntimeException(msg)

  def decode(d: Array[Byte]): Either[String, Mp4Stats] = {
    if (!sniff(d)) return Left("mp4: first box is not ftyp")
    try decodeInner(d)
    catch {
      case Abort(m) => Left(m)
      case _: ArrayIndexOutOfBoundsException => Left("mp4: truncated payload")
    }
  }

  private final class TrackCtx {
    var handler = ""
    var codec = ""
    var w = 0
    var h = 0
  }

  private def decodeInner(d: Array[Byte]): Either[String, Mp4Stats] = {
    def u32(o: Int): Long =
      ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
        ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
    def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    def fourcc(o: Int): String =
      new String(d, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    var brand = ""
    var minorVersion = -1L
    var timescale = -1L
    var duration = -1L
    val tracks = scala.collection.mutable.ArrayBuffer.empty[TrackCtx]

    // containers whose children this profile walks; everything else
    // is skipped whole (mdat especially — never touched)
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")

    def walk(from: Int, until: Int, topLevel: Boolean, ctx: TrackCtx): Unit = {
      var pos = from
      while (pos < until) {
        if (pos + 8 > until) throw Abort("mp4: truncated box header")
        val size32 = u32(pos)
        val typ = fourcc(pos + 4)
        val (body, end) =
          if (size32 == 0) {
            // "to end of file": only the final top-level box may claim it
            if (!topLevel) throw Abort(s"mp4: size-0 box $typ below top level")
            (pos + 8, until)
          } else if (size32 == 1) {
            if (pos + 16 > until) throw Abort("mp4: truncated largesize")
            val large = u64(pos + 8)
            if (large < 16) throw Abort(s"mp4: largesize $large under header size")
            val e = pos + large
            if (e > until) throw Abort(s"mp4: box $typ runs past its parent")
            (pos + 16, e.toInt)
          } else {
            if (size32 < 8) throw Abort(s"mp4: box size $size32 under header size")
            val e = pos + size32
            if (e > until) throw Abort(s"mp4: box $typ runs past its parent")
            (pos + 8, e.toInt)
          }
        typ match {
          case "ftyp" =>
            if (body + 8 > end) throw Abort("mp4: ftyp too short")
            brand = fourcc(body)
            minorVersion = u32(body + 4)
          case "moof" | "mvex" =>
            throw Abort("mp4: fragmented movies are out of scope")
          case "mvhd" =>
            val ver = d(body) & 0xff
            if (ver > 1) throw Abort(s"mp4: mvhd version $ver out of scope")
            // FullBox header 4, then v0: creation 4 + modification 4;
            // v1: 8 + 8 — timescale is u32 in BOTH versions
            val o = body + 4 + (if (ver == 1) 16 else 8)
            if (o + (if (ver == 1) 12 else 8) > end) throw Abort("mp4: mvhd too short")
            timescale = u32(o)
            duration = if (ver == 1) u64(o + 4) else u32(o + 4)
            if (timescale <= 0) throw Abort("mp4: mvhd timescale is zero")
          case "trak" =>
            val t = new TrackCtx
            walk(body, end, topLevel = false, t)
            tracks += t
          case "tkhd" =>
            if (ctx == null) throw Abort("mp4: tkhd outside trak")
            val ver = d(body) & 0xff
            if (ver > 1) throw Abort(s"mp4: tkhd version $ver out of scope")
            // after FullBox hdr: v0 creation 4 + modification 4 +
            // track_ID 4 + reserved 4 + duration 4 = 20 (v1: 32), then
            // reserved 8, layer/alt/volume/reserved 8, matrix 36
            val o = body + 4 + (if (ver == 1) 32 else 20) + 8 + 8 + 36
            if (o + 8 > end) throw Abort("mp4: tkhd too short")
            ctx.w = (u32(o) >>> 16).toInt // 16.16 fixed -> integer part
            ctx.h = (u32(o + 4) >>> 16).toInt
          case "hdlr" =>
            if (ctx != null) {
              // FullBox hdr 4 + pre_defined 4, then handler_type
              if (body + 12 > end) throw Abort("mp4: hdlr too short")
              ctx.handler = fourcc(body + 8)
            }
          case "stsd" =>
            if (ctx == null) throw Abort("mp4: stsd outside trak")
            if (body + 8 > end) throw Abort("mp4: stsd too short")
            val entries = u32(body + 4)
            if (entries > 0) {
              // first sample entry: u32 size + format fourcc
              if (body + 16 > end) throw Abort("mp4: stsd entry too short")
              ctx.codec = fourcc(body + 12)
            }
          case t if containers.contains(t) =>
            walk(body, end, topLevel = false, ctx)
          case _ => () // unknown / mdat / free: skipped whole
        }
        pos = end
      }
    }

    walk(0, d.length, topLevel = true, null)
    if (timescale < 0) return Left("mp4: no moov/mvhd box")
    val vide = tracks.find(_.handler == "vide")
    val soun = tracks.find(_.handler == "soun")
    Right(Mp4Stats(brand, minorVersion, timescale,
      duration * 1000L / timescale, tracks.size,
      vide.map(_.w).getOrElse(0), vide.map(_.h).getOrElse(0),
      vide.map(_.codec).getOrElse(""), soun.map(_.codec).getOrElse("")))
  }

  // ------------------------------------------------------------ encode

  final case class Mp4Track(
      handler: String, // vide | soun
      codec: String, // sample-entry fourcc
      trackId: Long,
      width: Int,
      height: Int)

  /** Deterministic ISO-BMFF encoder — the `Media.toMp4` adapter /
    * fixture substrate: ftyp + moov(mvhd + trak(tkhd + mdia(hdlr +
    * minf(stbl(stsd))))) + mdat carrying the filler bytes. mvhd and
    * the FIRST track's tkhd alternate version 0/1 with the duration's
    * parity so both layouts stay exercised.
    */
  def encodeMp4(
      brand: String, minorVersion: Long, timescale: Long, duration: Long,
      tracks: Seq[Mp4Track], mdat: Array[Byte]): Array[Byte] = {
    require(brand.length == 4, s"encodeMp4: brand '$brand' not a fourcc")
    require(timescale > 0, "encodeMp4: timescale must be positive")
    def be32(v: Long): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def cc(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def box(typ: String, parts: Array[Byte]*): Array[Byte] = {
      val payload = parts.foldLeft(Array.emptyByteArray)(_ ++ _)
      be32(8L + payload.length) ++ cc(typ) ++ payload
    }
    val v1 = duration % 2 == 1 // exercise both FullBox layouts
    val mvhd =
      if (v1) box("mvhd", Array[Byte](1, 0, 0, 0), be64(0), be64(0),
        be32(timescale), be64(duration), be32(0x00010000L), be32(0),
        new Array[Byte](76))
      else box("mvhd", Array[Byte](0, 0, 0, 0), be32(0), be32(0),
        be32(timescale), be32(duration), be32(0x00010000L), be32(0),
        new Array[Byte](76))
    val traks = tracks.zipWithIndex.map { case (t, i) =>
      val tv1 = v1 && i == 0
      val tkhd =
        if (tv1) box("tkhd", Array[Byte](1, 0, 0, 7), be64(0), be64(0),
          be32(t.trackId), be32(0), be64(duration), new Array[Byte](16),
          new Array[Byte](36),
          be32(t.width.toLong << 16), be32(t.height.toLong << 16))
        else box("tkhd", Array[Byte](0, 0, 0, 7), be32(0), be32(0),
          be32(t.trackId), be32(0), be32(duration), new Array[Byte](16),
          new Array[Byte](36),
          be32(t.width.toLong << 16), be32(t.height.toLong << 16))
      val hdlr = box("hdlr", Array[Byte](0, 0, 0, 0), be32(0),
        cc(t.handler), new Array[Byte](12), Array[Byte](0))
      val entry = box(t.codec, new Array[Byte](8)) // opaque sample entry
      val stsd = box("stsd", Array[Byte](0, 0, 0, 0), be32(1), entry)
      val stbl = box("stbl", stsd)
      val minf = box("minf", stbl)
      val mdia = box("mdia", hdlr, minf)
      box("trak", tkhd, mdia)
    }
    val moov = box("moov", (mvhd +: traks): _*)
    val ftyp = box("ftyp", cc(brand), be32(minorVersion), cc("isom"))
    ftyp ++ moov ++ box("mdat", mdat)
  }
}
