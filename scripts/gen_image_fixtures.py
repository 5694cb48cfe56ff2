#!/usr/bin/env python3
"""Generate the committed media fixtures under src/test/resources/graft/fixtures
and print the exact stats ImageCodecSpec/AudioCodecSpec pin. Deterministic —
re-running must reproduce the committed bytes bit-for-bit. Driver-side tooling
only (like check_correctness.py); never a library dependency.
"""
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "graft", "fixtures")
os.makedirs(OUT, exist_ok=True)

W, H = 8, 5


def px(x, y):
    return ((x * 31) % 256, (y * 53) % 256, (x * 7 + y * 11) % 256)


def stats(samples, channels, w, h):
    n = w * h
    sums = [0] * channels
    for i, v in enumerate(samples):
        sums[i % channels] += v
    means = [s / n for s in sums]
    if channels == 1:
        means = means * 3
    return dict(w=w, h=h, n=n, r=means[0], g=means[1], b=means[2],
                mn=min(samples), mx=max(samples))


# --- gradient.ppm (P6, with a header comment to exercise comment parsing) ---
rgb = [c for y in range(H) for x in range(W) for c in px(x, y)]
ppm = b"P6\n# graft fixture: 8x5 deterministic gradient\n%d %d\n255\n" % (W, H) + bytes(rgb)
with open(os.path.join(OUT, "gradient.ppm"), "wb") as f:
    f.write(ppm)
print("gradient.ppm", stats(rgb, 3, W, H))

# --- gradient.bmp (24bpp BI_RGB, bottom-up, padded rows; SAME pixels) ---
row_size = (3 * W + 3) // 4 * 4
raster = b""
for y in range(H - 1, -1, -1):  # bottom-up
    row = b""
    for x in range(W):
        r, g, b = px(x, y)
        row += bytes([b, g, r])  # BGR
    raster += row + b"\x00" * (row_size - len(row))
data_offset = 14 + 40
file_size = data_offset + len(raster)
bmp = (b"BM" + struct.pack("<IHHI", file_size, 0, 0, data_offset)
       + struct.pack("<IiiHHIIiiII", 40, W, H, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
       + raster)
with open(os.path.join(OUT, "gradient.bmp"), "wb") as f:
    f.write(bmp)
print("gradient.bmp", "same stats as gradient.ppm (pixels identical)")

# --- PNG fixtures (independent encoder: python zlib, NOT the Scala one,
#     so an encoder/decoder bug pair in the library cannot cancel) ---
import zlib
import binascii


def paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if pa <= pb and pa <= pc else (b if pb <= pc else c)


ADAM7 = [(0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
         (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2)]


def write_png(path, w, h, color_type, rows, filters, depth=8, plte=None,
              interlace=0):
    """rows: list of h lists of per-pixel channel tuples (sample VALUES:
    palette indices for type 3, 0..65535 for depth 16); filters: per-row
    PNG filter type actually APPLIED (exercises the decoder's unfilter).
    interlace=1 emits the seven Adam7 pass sub-images (filters reset
    per pass)."""
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    bpp = max(1, nch * (depth // 8))  # packed sub-byte rows filter at stride 1

    def to_line(pixels):
        samples = [v for pxl in pixels for v in pxl]
        if depth == 16:
            return [b for v in samples for b in ((v >> 8) & 0xFF, v & 0xFF)]
        if depth < 8:  # sub-byte indexed: pack big-endian within bytes
            lb = (len(samples) * depth + 7) // 8
            line = [0] * lb
            for i, v in enumerate(samples):
                bp = i * depth
                line[bp >> 3] |= (v & ((1 << depth) - 1)) << (8 - depth - (bp & 7))
            return line
        return samples

    def filter_sub(sub_rows):
        raw = b""
        prev = [0] * (len(sub_rows[0]) if sub_rows else 0)
        for y, line in enumerate(sub_rows):
            ft = filters[y % len(filters)]
            enc = []
            for i, x in enumerate(line):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if ft == 0:
                    f = x
                elif ft == 1:
                    f = x - a
                elif ft == 2:
                    f = x - b
                elif ft == 3:
                    f = x - (a + b) // 2
                else:
                    f = x - paeth(a, b, c)
                enc.append(f & 0xFF)
            raw += bytes([ft]) + bytes(enc)
            prev = line
        return raw

    if interlace == 0:
        raw = filter_sub([to_line(rows[y]) for y in range(h)])
    else:
        raw = b""
        for (x0, dx, y0, dy) in ADAM7:
            pw = (w - x0 + dx - 1) // dx if w > x0 else 0
            ph = (h - y0 + dy - 1) // dy if h > y0 else 0
            if pw > 0 and ph > 0:
                raw += filter_sub([
                    to_line([rows[y0 + r * dy][x0 + c * dx] for c in range(pw)])
                    for r in range(ph)])
    z = zlib.compress(raw, 6)

    def chunk(typ, body):
        return (struct.pack(">I", len(body)) + typ + body
                + struct.pack(">I", binascii.crc32(typ + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    png = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if plte is not None:
        png += chunk(b"PLTE", bytes([v for rgb in plte for v in rgb]))
    # split IDAT so the multi-chunk streaming path is on the fixture too
    half = max(1, len(z) // 2)
    png += chunk(b"IDAT", z[:half]) + chunk(b"IDAT", z[half:])
    # an ancillary chunk the walker must skip
    png += chunk(b"tEXt", b"Comment\x00graft fixture") + chunk(b"IEND", b"")
    with open(path, "wb") as f:
        f.write(png)


# gradient.png: SAME pixels as gradient.ppm, every filter type used
png_rows = [[px(x, y) for x in range(W)] for y in range(H)]
write_png(os.path.join(OUT, "gradient.png"), W, H, 2, png_rows, [0, 1, 2, 3, 4])
print("gradient.png", "same stats as gradient.ppm (pixels identical)")

# --- gray.pgm (P5 grayscale, 6x4) ---
GW, GH = 6, 4
gray = [(x * 17 + y * 29) % 256 for y in range(GH) for x in range(GW)]
pgm = b"P5\n%d %d\n255\n" % (GW, GH) + bytes(gray)
with open(os.path.join(OUT, "gray.pgm"), "wb") as f:
    f.write(pgm)
print("gray.pgm", stats(gray, 1, GW, GH))

# gray.png: color type 0 (grayscale), SAME pixels as gray.pgm
write_png(os.path.join(OUT, "gray.png"), GW, GH, 0,
          [[(gray[y * GW + x],) for x in range(GW)] for y in range(GH)],
          [4, 3, 2, 1])
print("gray.png", "same stats as gray.pgm (pixels identical)")

# palette.png: color type 3, 8-bit indexed, 16-entry PLTE, every filter;
# stats are over the MAPPED RGB samples
PW, PH = 7, 5
PLTE = [((i * 5) % 256, (i * 11) % 256, (i * 23) % 256) for i in range(16)]
pidx = [[((x * 3 + y * 5) % 16,) for x in range(PW)] for y in range(PH)]
write_png(os.path.join(OUT, "palette.png"), PW, PH, 3, pidx,
          [0, 1, 2, 3, 4], plte=PLTE)
prgb = [v for row in pidx for (i,) in row for v in PLTE[i]]
print("palette.png", stats(prgb, 3, PW, PH))

# palette4.png: the SAME indexed pixels at 4-bit depth — identical
# stats through the packed-bit path (filters run over packed bytes)
write_png(os.path.join(OUT, "palette4.png"), PW, PH, 3, pidx,
          [4, 3, 2, 1, 0], depth=4, plte=PLTE)
print("palette4.png", "same stats as palette.png (pixels identical, 4-bit)")

# palette1.png: 1-bit two-entry palette, 9x4 (ragged final byte)
P1W, P1H = 9, 4
PLTE1 = [(10, 200, 30), (240, 5, 60)]
p1idx = [[((x + y) % 2,) for x in range(P1W)] for y in range(P1H)]
write_png(os.path.join(OUT, "palette1.png"), P1W, P1H, 3, p1idx,
          [0, 2, 1, 3], depth=1, plte=PLTE1)
p1rgb = [v for row in p1idx for (i,) in row for v in PLTE1[i]]
print("palette1.png", stats(p1rgb, 3, P1W, P1H))

# gray16.png: color type 0 at 16 bits — BE sample pairs, bpp-2 unfilter
GW16, GH16 = 6, 4
g16 = [(x * 4099 + y * 12007) % 65536 for y in range(GH16) for x in range(GW16)]
write_png(os.path.join(OUT, "gray16.png"), GW16, GH16, 0,
          [[(g16[y * GW16 + x],) for x in range(GW16)] for y in range(GH16)],
          [2, 0, 4, 1, 3], depth=16)
print("gray16.png", stats(g16, 1, GW16, GH16))

# adam7.png: the gradient pixels again, Adam7-INTERLACED — identical
# stats and aHash to gradient.ppm through the seven-pass walk
write_png(os.path.join(OUT, "adam7.png"), W, H, 2, png_rows, [0, 1, 2, 3, 4],
          interlace=1)
print("adam7.png", "same stats as gradient.ppm (pixels identical, Adam7)")

# rgba.png: color type 6 — alpha varies but must NOT move the color stats
write_png(os.path.join(OUT, "rgba.png"), W, H, 6,
          [[px(x, y) + ((x * 97 + y * 13) % 256,) for x in range(W)]
           for y in range(H)],
          [1, 4])
print("rgba.png", "same COLOR stats as gradient.ppm (alpha excluded)")

# --- tone.wav (16-bit stereo PCM @8000 Hz, 100 frames, a LIST chunk to skip) ---
RATE, FRAMES, CH = 8000, 100, 2
samples = [((i * 373) % 4001) - 2000 for i in range(FRAMES * CH)]
data = b"".join(struct.pack("<h", s) for s in samples)
list_chunk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size -> pad byte
fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, CH, RATE, RATE * CH * 2, CH * 2, 16)
body = b"WAVE" + fmt + list_chunk + b"data" + struct.pack("<I", len(data)) + data
wav = b"RIFF" + struct.pack("<I", len(body)) + body
with open(os.path.join(OUT, "tone.wav"), "wb") as f:
    f.write(wav)
print("tone.wav", dict(ch=CH, rate=RATE, frames=FRAMES,
                       dur_ms=FRAMES * 1000 // RATE,
                       mean=sum(samples) / len(samples),
                       mn=min(samples), mx=max(samples)))

# --- clip.y4m (YUV4MPEG2, 6x4 C420, 3 frames @30000:1001, frame params) ---
VW, VH, VF = 6, 4, 3
fsz = VW * VH + 2 * (VW // 2) * (VH // 2)
frames_bytes = []
for k in range(VF):
    frames_bytes.append(bytes((k * 47 + i * 31) % 256 for i in range(fsz)))
hdr = b"YUV4MPEG2 W6 H4 F30000:1001 Ip A128:117 C420 XYSCSS=420\n"
# frame 1 carries a frame-level parameter to exercise the param skip
markers = [b"FRAME\n", b"FRAME Xcustom=1\n", b"FRAME\n"]
y4m = hdr + b"".join(m + f for m, f in zip(markers, frames_bytes))
with open(os.path.join(OUT, "clip.y4m"), "wb") as f:
    f.write(y4m)
ys = [v for fb in frames_bytes for v in fb[:VW * VH]]
print("clip.y4m", dict(w=VW, h=VH, frames=VF,
                       dur_ms=VF * 1000 * 1001 // 30000,
                       y_mean=sum(ys) / len(ys), y_min=min(ys), y_max=max(ys)))

# --- JPEG fixtures: INDEPENDENT pure-python baseline encoder, plus an
#     arithmetic MIRROR of JpegCodec's decode (same IDCT basis doubles,
#     same summation order, same floor(x+0.5) rounding, same YCbCr
#     constants), so the printed stats are BIT-EXACT expectations for
#     the Scala decoder on these files. The Scala IdctM constants were
#     generated from this exact expression.
import math

IDCTM = [[(1 / math.sqrt(2) if u == 0 else 1.0) / 2
          * math.cos((2 * x + 1) * u * math.pi / 16)
          for u in range(8)] for x in range(8)]

# The 64 exact IEEE-754 bit patterns JpegCodec.IdctM embeds. Regenerating
# fixtures under a libm whose cos/sqrt round differently would silently
# break the bit-exact pin — so assert the runtime-computed basis matches
# these committed patterns and fail LOUDLY on any divergence.
IDCTM_BITS = [
    0x3FD6A09E667F3BCC, 0x3FDF6297CFF75CB0, 0x3FDD906BCF328D46,
    0x3FDA9B66290EA1A3, 0x3FD6A09E667F3BCD, 0x3FD1C73B39AE68C9,
    0x3FC87DE2A6AEA964, 0x3FB8F8B83C69A60D, 0x3FD6A09E667F3BCC,
    0x3FDA9B66290EA1A3, 0x3FC87DE2A6AEA964, 0xBFB8F8B83C69A608,
    0xBFD6A09E667F3BCC, 0xBFDF6297CFF75CB0, 0xBFDD906BCF328D47,
    0xBFD1C73B39AE68C8, 0x3FD6A09E667F3BCC, 0x3FD1C73B39AE68C9,
    0xBFC87DE2A6AEA962, 0xBFDF6297CFF75CB0, 0xBFD6A09E667F3BCE,
    0x3FB8F8B83C69A60C, 0x3FDD906BCF328D44, 0x3FDA9B66290EA1A5,
    0x3FD6A09E667F3BCC, 0x3FB8F8B83C69A60D, 0xBFDD906BCF328D46,
    0xBFD1C73B39AE68C8, 0x3FD6A09E667F3BCB, 0x3FDA9B66290EA1A5,
    0xBFC87DE2A6AEA965, 0xBFDF6297CFF75CB2, 0x3FD6A09E667F3BCC,
    0xBFB8F8B83C69A608, 0xBFDD906BCF328D47, 0x3FD1C73B39AE68C5,
    0x3FD6A09E667F3BCE, 0xBFDA9B66290EA1A2, 0xBFC87DE2A6AEA971,
    0x3FDF6297CFF75CB0, 0x3FD6A09E667F3BCC, 0xBFD1C73B39AE68C6,
    0xBFC87DE2A6AEA96D, 0x3FDF6297CFF75CB0, 0xBFD6A09E667F3BC5,
    0xBFB8F8B83C69A602, 0x3FDD906BCF328D46, 0xBFDA9B66290EA1A1,
    0x3FD6A09E667F3BCC, 0xBFDA9B66290EA1A4, 0x3FC87DE2A6AEA967,
    0x3FB8F8B83C69A61D, 0xBFD6A09E667F3BC9, 0x3FDF6297CFF75CB2,
    0xBFDD906BCF328D43, 0x3FD1C73B39AE68C2, 0x3FD6A09E667F3BCC,
    0xBFDF6297CFF75CB0, 0x3FDD906BCF328D44, 0xBFDA9B66290EA1A2,
    0x3FD6A09E667F3BC4, 0xBFD1C73B39AE68C2, 0x3FC87DE2A6AEA95F,
    0xBFB8F8B83C69A616,
]
import struct
for x in range(8):
    for u in range(8):
        got = struct.unpack("<Q", struct.pack("<d", IDCTM[x][u]))[0]
        want = IDCTM_BITS[x * 8 + u] & 0xFFFFFFFFFFFFFFFF
        assert got == want, (
            f"IDCT basis diverges from the committed bit pattern at "
            f"({x},{u}): libm produced {got:016X}, JpegCodec.IdctM has "
            f"{want:016X} — do NOT regenerate fixtures on this host")
ZZ = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
      12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]

DC_L_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_L_VALS = list(range(12))
DC_C_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_C_VALS = list(range(12))
AC_L_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_L_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
AC_C_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_C_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def build_enc(bits, vals):
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


class BW:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, ln):
        for i in range(ln - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc & 0xFF)
                if (self.acc & 0xFF) == 0xFF:
                    self.buf.append(0)
                self.acc = 0
                self.n = 0

    def flush(self):
        if self.n:
            self.put(0xFF, 8 - self.n)


def category(v):
    a = abs(v)
    c = 0
    while a:
        a >>= 1
        c += 1
    return c


def bits_of(v, cat):
    return (v if v >= 0 else v - 1) & ((1 << cat) - 1)


def fdct_quant(block, q):
    """block: 64 natural-order samples; q: natural-order quant table."""
    tmp = [[0.0] * 8 for _ in range(8)]
    for y in range(8):
        for u in range(8):
            acc = 0.0
            for x in range(8):
                acc += IDCTM[x][u] * (block[y * 8 + x] - 128)
            tmp[y][u] = acc
    out = [0] * 64
    for v in range(8):
        for u in range(8):
            acc = 0.0
            for y in range(8):
                acc += IDCTM[y][v] * tmp[y][u]
            r = acc / q[v * 8 + u]
            out[v * 8 + u] = int(math.floor(r + 0.5)) if r >= 0 else -int(math.floor(-r + 0.5))
    return out


def idct_mirror(qc, q):
    """EXACT mirror of JpegCodec's dequant+IDCT+round+clamp."""
    coef = [qc[i] * q[i] for i in range(64)]
    tmp = [[0.0] * 8 for _ in range(8)]
    for v in range(8):
        for x in range(8):
            acc = 0.0
            for u in range(8):
                acc += IDCTM[x][u] * coef[v * 8 + u]
            tmp[v][x] = acc
    out = [0] * 64
    for y in range(8):
        for x in range(8):
            acc = 0.0
            for v in range(8):
                acc += IDCTM[y][v] * tmp[v][x]
            s = int(math.floor(acc + 128.5))
            out[y * 8 + x] = 0 if s < 0 else (255 if s > 255 else s)
    return out


def encode_jpeg(path, w, h, comps, restart=0):
    """comps: list of dicts {plane (2-d, padded to 8*vf rows / MCU-x
    multiples), pw, hf, vf, q (natural order)}; writes `path` and
    returns the mirror-DECODED component planes (same padded dims)."""
    gray = len(comps) == 1
    out = bytearray()

    def b(v):
        out.append(v & 0xFF)

    def b16(v):
        b(v >> 8)
        b(v)

    def marker(m):
        b(0xFF)
        b(m)

    marker(0xD8)
    marker(0xE0)
    b16(16)
    out += b"JFIF\x00"
    b(1); b(1); b(0)
    b16(1); b16(1)
    b(0); b(0)

    qtabs = [comps[0]["q"]] + ([comps[1]["q"]] if not gray else [])
    marker(0xDB)
    b16(2 + 65 * len(qtabs))
    for t, q in enumerate(qtabs):
        b(t)
        for k in range(64):
            b(q[ZZ[k]])  # DQT is zigzag-ordered

    marker(0xC0)
    b16(8 + 3 * len(comps))
    b(8)
    b16(h); b16(w)
    b(len(comps))
    for i, c in enumerate(comps):
        b(i + 1)
        b((c["hf"] << 4) | c["vf"])
        b(0 if i == 0 else 1)

    def dht(tc, th, bits, vals):
        marker(0xC4)
        b16(2 + 1 + 16 + len(vals))
        b((tc << 4) | th)
        for x in bits:
            b(x)
        for x in vals:
            b(x)

    dht(0, 0, DC_L_BITS, DC_L_VALS)
    dht(1, 0, AC_L_BITS, AC_L_VALS)
    if not gray:
        dht(0, 1, DC_C_BITS, DC_C_VALS)
        dht(1, 1, AC_C_BITS, AC_C_VALS)

    if restart:
        marker(0xDD)
        b16(4)
        b16(restart)

    marker(0xDA)
    b16(6 + 2 * len(comps))
    b(len(comps))
    for i in range(len(comps)):
        b(i + 1)
        b(0x00 if i == 0 else 0x11)
    b(0); b(63); b(0)

    enc_dc = [build_enc(DC_L_BITS, DC_L_VALS), build_enc(DC_C_BITS, DC_C_VALS)]
    enc_ac = [build_enc(AC_L_BITS, AC_L_VALS), build_enc(AC_C_BITS, AC_C_VALS)]
    bw = BW()
    pred = [0] * len(comps)
    hmax = max(c["hf"] for c in comps)
    vmax = max(c["vf"] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    decoded = [[[0] * c["pw"] for _ in range(len(c["plane"]))] for c in comps]
    mcu_idx = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_idx > 0 and mcu_idx % restart == 0:
                bw.flush()
                out += bw.buf
                bw.buf = bytearray()
                marker(0xD0 + rst)
                rst = (rst + 1) % 8
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                t = 0 if ci == 0 else 1
                for by in range(c["vf"]):
                    for bx in range(c["hf"]):
                        x0 = (mx * c["hf"] + bx) * 8
                        y0 = (my * c["vf"] + by) * 8
                        block = [c["plane"][y0 + yy][x0 + xx]
                                 for yy in range(8) for xx in range(8)]
                        qc = fdct_quant(block, c["q"])
                        dec = idct_mirror(qc, c["q"])
                        for yy in range(8):
                            for xx in range(8):
                                decoded[ci][y0 + yy][x0 + xx] = dec[yy * 8 + xx]
                        dc = qc[0]
                        diff = dc - pred[ci]
                        pred[ci] = dc
                        cat = category(diff)
                        co, ln = enc_dc[t][cat]
                        bw.put(co, ln)
                        if cat:
                            bw.put(bits_of(diff, cat), cat)
                        run = 0
                        for k in range(1, 64):
                            ac = qc[ZZ[k]]
                            if ac == 0:
                                run += 1
                            else:
                                while run > 15:
                                    co, ln = enc_ac[t][0xF0]
                                    bw.put(co, ln)
                                    run -= 16
                                s = category(ac)
                                co, ln = enc_ac[t][(run << 4) | s]
                                bw.put(co, ln)
                                bw.put(bits_of(ac, s), s)
                                run = 0
                        if run:
                            co, ln = enc_ac[t][0x00]
                            bw.put(co, ln)
            mcu_idx += 1
    bw.flush()
    out += bw.buf
    marker(0xD9)
    with open(path, "wb") as f:
        f.write(bytes(out))
    return decoded


def clamp8(v):
    return 0 if v < 0 else (255 if v > 255 else v)


UNIT_Q = [1] * 64
LUM_Q = [16, 11, 10, 16, 24, 40, 51, 61,
         12, 12, 14, 19, 26, 58, 60, 55,
         14, 13, 16, 24, 40, 57, 69, 56,
         14, 17, 22, 29, 51, 87, 80, 62,
         18, 22, 37, 56, 68, 109, 103, 77,
         24, 35, 55, 64, 81, 104, 113, 92,
         49, 64, 78, 87, 103, 121, 120, 101,
         72, 92, 95, 98, 112, 100, 103, 99]
CHR_Q = [17, 18, 24, 47, 99, 99, 99, 99,
         18, 21, 26, 66, 99, 99, 99, 99,
         24, 26, 56, 99, 99, 99, 99, 99,
         47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32

# flat.jpg: grayscale 24x16, 3x2 flat 8px tiles, unit quant, DRI=2 —
# DC-only blocks are exactly invertible, so the stats are the tile
# bytes' (restart path pinned through an independent encoder)
FT = [0, 255, 7, 130, 200, 64]
flat_plane = [[FT[(y // 8) * 3 + x // 8] for x in range(24)] for y in range(16)]
dec = encode_jpeg(os.path.join(OUT, "flat.jpg"), 24, 16,
                  [dict(plane=flat_plane, pw=24, hf=1, vf=1, q=UNIT_Q)],
                  restart=2)
fs = [dec[0][y][x] for y in range(16) for x in range(24)]
print("flat.jpg", dict(w=24, h=16, n=384, mean=sum(fs) / len(fs),
                       mn=min(fs), mx=max(fs),
                       exact=(fs == [v for row in flat_plane for v in row])))

# gradient420.jpg: 16x16 px() gradient, REAL Annex-K-style quant, 4:2:0 —
# nonzero AC, zigzag runs, chroma downsample + upsample; expected stats
# come from the arithmetic mirror (bit-exact vs the Scala decoder)
JW = JH = 16
rgbpx = [[px(x, y) for x in range(JW)] for y in range(JH)]
yP = [[clamp8(int(math.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5)))
       for (r, g, b) in row] for row in rgbpx]
cbP = [[clamp8(int(math.floor(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b + 0.5)))
        for (r, g, b) in row] for row in rgbpx]
crP = [[clamp8(int(math.floor(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5)))
        for (r, g, b) in row] for row in rgbpx]


def down(p):
    return [[(p[2 * y][2 * x] + p[2 * y][2 * x + 1]
              + p[2 * y + 1][2 * x] + p[2 * y + 1][2 * x + 1] + 2) // 4
             for x in range(JW // 2)] for y in range(JH // 2)]


decc = encode_jpeg(os.path.join(OUT, "gradient420.jpg"), JW, JH,
                   [dict(plane=yP, pw=JW, hf=2, vf=2, q=LUM_Q),
                    dict(plane=down(cbP), pw=JW // 2, hf=1, vf=1, q=CHR_Q),
                    dict(plane=down(crP), pw=JW // 2, hf=1, vf=1, q=CHR_Q)])
rs = gs = bs = 0
mnj, mxj = 255, 0
for y in range(JH):
    for x in range(JW):
        yv = decc[0][y][x]
        cb = decc[1][y // 2][x // 2] - 128
        cr = decc[2][y // 2][x // 2] - 128
        r = clamp8(int(math.floor(yv + 1.402 * cr + 0.5)))
        g = clamp8(int(math.floor(yv - 0.344136 * cb - 0.714136 * cr + 0.5)))
        bb = clamp8(int(math.floor(yv + 1.772 * cb + 0.5)))
        rs += r; gs += g; bs += bb
        mnj = min(mnj, r, g, bb)
        mxj = max(mxj, r, g, bb)
n = JW * JH
print("gradient420.jpg", dict(w=JW, h=JH, n=n, r=rs / n, g=gs / n, b=bs / n,
                              mn=mnj, mx=mxj))

# gradient422.jpg: 4:2:2 (Y hf=2 vf=1, chroma halved horizontally only)
# — the remaining common MCU layout; same mirror-exact discipline
H422 = 8
decd = encode_jpeg(os.path.join(OUT, "gradient422.jpg"), JW, H422,
                   [dict(plane=yP[:H422], pw=JW, hf=2, vf=1, q=LUM_Q),
                    dict(plane=[[(p[2 * x] + p[2 * x + 1] + 1) // 2
                                 for x in range(JW // 2)]
                                for p in cbP[:H422]], pw=JW // 2, hf=1, vf=1,
                         q=CHR_Q),
                    dict(plane=[[(p[2 * x] + p[2 * x + 1] + 1) // 2
                                 for x in range(JW // 2)]
                                for p in crP[:H422]], pw=JW // 2, hf=1, vf=1,
                         q=CHR_Q)])
rs = gs = bs = 0
mnj, mxj = 255, 0
for y in range(H422):
    for x in range(JW):
        yv = decd[0][y][x]
        cb = decd[1][y][x // 2] - 128
        cr = decd[2][y][x // 2] - 128
        r = clamp8(int(math.floor(yv + 1.402 * cr + 0.5)))
        g = clamp8(int(math.floor(yv - 0.344136 * cb - 0.714136 * cr + 0.5)))
        bb = clamp8(int(math.floor(yv + 1.772 * cb + 0.5)))
        rs += r; gs += g; bs += bb
        mnj = min(mnj, r, g, bb)
        mxj = max(mxj, r, g, bb)
n = JW * H422
print("gradient422.jpg", dict(w=JW, h=H422, n=n, r=rs / n, g=gs / n, b=bs / n,
                              mn=mnj, mx=mxj))

# --- sample.gif: INDEPENDENT GIF89a encoder (LSB-first LZW, no early
#     change, width bump at the decoder-table schedule), SAME indexed
#     pixels as palette.png, INTERLACED — identical stats through the
#     four-pass walk. Spec-derived, not a port of the Scala encoder.
def gif_encode(path, rows, pal, w, h, interlaced=False):
    pal_n = len(pal)
    bits = 1
    while (1 << bits) < pal_n:
        bits += 1
    ct_n = 1 << bits
    min_code = max(2, bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | ((bits - 1) & 7))
    out += b"\x00\x00"
    for i in range(ct_n):
        out += bytes(pal[i] if i < pal_n else (0, 0, 0))
    out.append(0x2C)
    out += struct.pack("<HHHH", 0, 0, w, h)
    out.append(0x40 if interlaced else 0x00)
    out.append(min_code)

    order = (list(range(0, h, 8)) + list(range(4, h, 8))
             + list(range(2, h, 4)) + list(range(1, h, 2))) if interlaced \
        else list(range(h))
    stream = [rows[y][x][0] for y in order for x in range(w)]

    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    acc = 0
    nbits = 0
    data = bytearray()

    def put(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    dic = {}
    next_code = eoi + 1
    put(clear)
    cur = -1
    for k in stream:
        if cur < 0:
            cur = k
        elif (cur, k) in dic:
            cur = dic[(cur, k)]
        else:
            put(cur)
            if next_code < 4096:
                # decoder-table schedule: bump BEFORE insert at 2^width
                if next_code == (1 << width) and width < 12:
                    width += 1
                dic[(cur, k)] = next_code
                next_code += 1
            else:
                put(clear)
                dic.clear()
                next_code = eoi + 1
                width = min_code + 1
            cur = k
    if cur >= 0:
        put(cur)
    put(eoi)
    if nbits:
        data.append(acc & 0xFF)
    off = 0
    while off < len(data):
        ln = min(255, len(data) - off)
        out.append(ln)
        out += data[off:off + ln]
        off += ln
    out.append(0)
    out.append(0x3B)
    with open(path, "wb") as f:
        f.write(bytes(out))


gif_encode(os.path.join(OUT, "sample.gif"), pidx, PLTE, PW, PH, interlaced=True)
print("sample.gif", "same stats as palette.png (pixels identical, interlaced GIF)")


# --- gradient.webp: SAME pixels as gradient.ppm, VP8L lossless -------
# INDEPENDENT python encoder (LSB-first bit writer, flat 8-bit
# canonical codes through the real code-length-code + max_symbol path,
# 0-bit single-symbol alpha/distance trees) - NOT a port of the Scala
# encoder, so a shared bit-order or canonical-assignment bug cannot
# cancel between the two halves.
CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]


def webp_lossless(path, rgb, w, h):
    data = bytearray()
    acc = 0
    nbits = 0

    def put(v, k):
        nonlocal acc, nbits
        acc |= (v & ((1 << k) - 1)) << nbits
        nbits += k
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def put_code(code, ln):  # canonical prefix code, MSB first
        for i in range(ln - 1, -1, -1):
            put((code >> i) & 1, 1)

    def flat8():
        put(0, 1)   # normal code
        put(15, 4)  # all 19 CL slots
        for s in CL_ORDER:
            put(1 if s in (8, 16) else 0, 3)
        put(1, 1)   # use max_symbol
        put(3, 3)   # nbits = 8
        put(42, 8)  # 2 + 42 = 44 tokens
        put_code(0, 1)  # literal length 8 (CL code: 8 -> '0', 16 -> '1')
        for _ in range(42):
            put_code(1, 1)
            put(3, 2)  # repeat previous x6
        put_code(1, 1)
        put(0, 2)      # repeat previous x3 -> 1 + 252 + 3 = 256

    def single(sym):
        put(1, 1)
        put(0, 1)
        if sym < 2:
            put(0, 1)
            put(sym, 1)
        else:
            put(1, 1)
            put(sym, 8)

    put(w - 1, 14)
    put(h - 1, 14)
    put(0, 1)  # no alpha
    put(0, 3)  # version 0
    put(0, 1)  # no transforms
    put(0, 1)  # no color cache
    put(0, 1)  # no meta prefix codes
    flat8()    # green
    flat8()    # red
    flat8()    # blue
    single(255)  # alpha
    single(0)    # distance
    for i in range(w * h):
        r, g, b = rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]
        put_code(g, 8)
        put_code(r, 8)
        put_code(b, 8)
    if nbits:
        data.append(acc & 0xFF)
    payload = bytes([0x2F]) + bytes(data)
    padded = len(payload) + (len(payload) & 1)
    out = b"RIFF" + (4 + 8 + padded).to_bytes(4, "little") + b"WEBP"
    out += b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        out += b"\x00"
    with open(path, "wb") as f:
        f.write(out)


webp_lossless(os.path.join(OUT, "gradient.webp"), rgb, W, H)
print("gradient.webp", "same stats as gradient.ppm (pixels identical, VP8L)")


# --- VP8L transform fixtures (r18B): predictor / palette / cross-color
#     / meta prefix groups, each through the independent python writer.
class VP8LBits:
    def __init__(self):
        self.data = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, v, k):
        self.acc |= (v & ((1 << k) - 1)) << self.nbits
        self.nbits += k
        while self.nbits >= 8:
            self.data.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def code(self, c, ln):  # canonical prefix code, MSB first
        for i in range(ln - 1, -1, -1):
            self.put((c >> i) & 1, 1)

    def flat8(self):
        self.put(0, 1)
        self.put(15, 4)
        for s in CL_ORDER:
            self.put(1 if s in (8, 16) else 0, 3)
        self.put(1, 1)
        self.put(3, 3)
        self.put(42, 8)
        self.code(0, 1)
        for _ in range(42):
            self.code(1, 1)
            self.put(3, 2)
        self.code(1, 1)
        self.put(0, 2)

    def single(self, sym):
        self.put(1, 1)
        self.put(0, 1)
        if sym < 2:
            self.put(0, 1)
            self.put(sym, 1)
        else:
            self.put(1, 1)
            self.put(sym, 8)

    def simple2(self, lo, hi):
        self.put(1, 1)
        self.put(1, 1)
        self.put(1, 1)
        self.put(lo, 8)
        self.put(hi, 8)

    def riff(self, path):
        if self.nbits:
            self.data.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        payload = bytes([0x2F]) + bytes(self.data)
        padded = len(payload) + (len(payload) & 1)
        out = b"RIFF" + (4 + 8 + padded).to_bytes(4, "little") + b"WEBP"
        out += b"VP8L" + len(payload).to_bytes(4, "little") + payload
        if len(payload) & 1:
            out += b"\x00"
        with open(path, "wb") as f:
            f.write(out)


def avg2c(a, b):
    return (a + b) // 2


# pred.webp: gradient pixels behind a predictor transform, ALL blocks
# mode 2 (T); residuals computed per the spec's edge rules.
pw_rgb = [px(x, y) for y in range(H) for x in range(W)]
b = VP8LBits()
b.put(W - 1, 14)
b.put(H - 1, 14)
b.put(0, 1)
b.put(0, 3)
b.put(1, 1)   # a transform follows
b.put(0, 2)   # type 0: predictor
b.put(0, 3)   # size_bits - 2 = 0 -> 4x4 blocks
# sub-image ceil(W/4) x ceil(H/4): every pixel green = mode 2; all
# trees single-symbol -> the sub-image is header-only
b.put(0, 1)   # sub: no color cache
b.single(2)   # green = mode 2
b.single(0)   # red
b.single(0)   # blue
b.single(0)   # alpha
b.single(0)   # distance
b.put(0, 1)   # end of transforms
b.put(0, 1)   # main: no color cache
b.put(0, 1)   # no meta
b.flat8()     # green residuals
b.flat8()     # red residuals
b.flat8()     # blue residuals
b.single(0)   # alpha residuals (always 0: every prediction has a=255)
b.single(0)   # distance
for y in range(H):
    for x in range(W):
        r, g, bl = pw_rgb[y * W + x]
        if x == 0 and y == 0:
            pr, pg, pb = 0, 0, 0  # opaque black
        elif y == 0:
            pr, pg, pb = pw_rgb[y * W + x - 1]  # L
        else:
            pr, pg, pb = pw_rgb[(y - 1) * W + x]  # T (mode 2; x==0 rule agrees)
        b.code((g - pg) & 0xFF, 8)
        b.code((r - pr) & 0xFF, 8)
        b.code((bl - pb) & 0xFF, 8)
b.riff(os.path.join(OUT, "pred.webp"))
print("pred.webp", "same stats as gradient.ppm (predictor transform, mode T)")

# pal.webp: palette.png's pixels behind a color-indexing transform
# (sub-byte packing) — same stats as palette.png.
pal_n = len(PLTE)  # list of (r, g, b) tuples
width_bits = 3 if pal_n <= 2 else 2 if pal_n <= 4 else 1 if pal_n <= 16 else 0
per_unit = 1 << width_bits
bits_per = 8 >> width_bits
packed_w = (PW + per_unit - 1) // per_unit
b = VP8LBits()
b.put(PW - 1, 14)
b.put(PH - 1, 14)
b.put(0, 1)
b.put(0, 3)
b.put(1, 1)   # a transform follows
b.put(3, 2)   # type 3: color indexing
b.put(pal_n - 1, 8)
# palette sub-image: pal_n x 1, literal DELTAS via flat8 channels
b.put(0, 1)   # sub: no cache
b.flat8()     # green deltas
b.flat8()     # red deltas
b.flat8()     # blue deltas
b.flat8()     # alpha deltas (255 then 0s)
b.single(0)   # distance
prev = (0, 0, 0, 0)  # a, r, g, b
for i in range(pal_n):
    r, g, bl = PLTE[i]
    da = (255 - prev[0]) & 0xFF
    dr = (r - prev[1]) & 0xFF
    dg = (g - prev[2]) & 0xFF
    db = (bl - prev[3]) & 0xFF
    b.code(dg, 8)
    b.code(dr, 8)
    b.code(db, 8)
    b.code(da, 8)
    prev = (255, r, g, bl)
b.put(0, 1)   # end of transforms
b.put(0, 1)   # main (packed): no cache
b.put(0, 1)   # no meta
b.flat8()     # green = packed index bytes
b.single(0)   # red
b.single(0)   # blue
b.single(255) # alpha
b.single(0)   # distance
for y in range(PH):
    for ux in range(packed_w):
        unit = 0
        for k in range(per_unit):
            x = ux * per_unit + k
            idx = pidx[y][x][0] if x < PW else 0
            unit |= (idx & ((1 << bits_per) - 1)) << (bits_per * k)
        b.code(unit, 8)
b.riff(os.path.join(OUT, "pal.webp"))
print("pal.webp", "same stats as palette.png (color-indexing transform, "
      f"{per_unit} px per green byte)")

# cc.webp: gradient pixels behind a cross-color transform (one element
# for every block) — same stats as gradient.ppm.
G2R, G2B, R2B = 16, 48, 8


def s8(v):
    return v - 256 if v >= 128 else v


def ct_delta(t, c):
    return (s8(t) * s8(c)) >> 5


b = VP8LBits()
b.put(W - 1, 14)
b.put(H - 1, 14)
b.put(0, 1)
b.put(0, 3)
b.put(1, 1)   # a transform follows
b.put(1, 2)   # type 1: cross-color
b.put(0, 3)   # 4x4 blocks
b.put(0, 1)   # sub: no cache
b.single(G2B)  # green channel carries green_to_blue
b.single(R2B)  # red channel carries red_to_blue
b.single(G2R)  # blue channel carries green_to_red
b.single(0)    # alpha
b.single(0)    # distance
b.put(0, 1)   # end of transforms
b.put(0, 1)
b.put(0, 1)
b.flat8()
b.flat8()
b.flat8()
b.single(255)
b.single(0)
for y in range(H):
    for x in range(W):
        r, g, bl = px(x, y)
        rs = (r - ct_delta(G2R, g)) & 0xFF
        bs = (bl - ct_delta(G2B, g) - ct_delta(R2B, r)) & 0xFF
        b.code(g, 8)
        b.code(rs, 8)
        b.code(bs, 8)
b.riff(os.path.join(OUT, "cc.webp"))
print("cc.webp", "same stats as gradient.ppm (cross-color transform)")

# meta.webp: 8x4, two meta prefix groups — left 4x4 block coded with
# flat8 trees, right 4x4 with 2-symbol simple trees; a group-selection
# bug desyncs the stream and cannot decode to these stats.
MW, MH = 8, 4
meta_px = []
for y in range(MH):
    for x in range(MW):
        if x < 4:
            meta_px.append(((x * 31 + y * 17) % 256,
                            (x * 13 + y * 7) % 256,
                            (x * 3 + y * 29) % 256))
        else:
            meta_px.append((200, 100, 50) if (x + y) % 2 == 0 else (20, 40, 60))
b = VP8LBits()
b.put(MW - 1, 14)
b.put(MH - 1, 14)
b.put(0, 1)
b.put(0, 3)
b.put(0, 1)   # no transforms
b.put(0, 1)   # no cache
b.put(1, 1)   # meta prefix codes present
b.put(0, 3)   # meta_bits - 2 = 0 -> 4x4 blocks -> entropy image 2x1
# entropy sub-image: green = group index (0 left, 1 right)
b.put(0, 1)   # sub: no cache
b.simple2(0, 1)  # green
b.single(0)
b.single(0)
b.single(0)
b.single(0)
b.code(0, 1)  # block (0,0) -> group 0
b.code(1, 1)  # block (1,0) -> group 1
# group 0 trees: flat8 literals
b.flat8()
b.flat8()
b.flat8()
b.single(255)
b.single(0)
# group 1 trees: two-symbol simple codes
b.simple2(40, 100)   # green
b.simple2(20, 200)   # red
b.simple2(50, 60)    # blue
b.single(255)
b.single(0)
for y in range(MH):
    for x in range(MW):
        r, g, bl = meta_px[y * MW + x]
        if x < 4:
            b.code(g, 8)
            b.code(r, 8)
            b.code(bl, 8)
        else:
            b.code(0 if g == 40 else 1, 1)
            b.code(0 if r == 20 else 1, 1)
            b.code(0 if bl == 50 else 1, 1)
b.riff(os.path.join(OUT, "meta.webp"))
mst = stats([c for p in meta_px for c in p], 3, MW, MH)
print("meta.webp", mst)
