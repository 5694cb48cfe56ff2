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


def write_png(path, w, h, color_type, rows, filters, depth=8, plte=None):
    """rows: list of h lists of per-pixel channel tuples (sample VALUES:
    palette indices for type 3, 0..65535 for depth 16); filters: per-row
    PNG filter type actually APPLIED (exercises the decoder's unfilter)."""
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    bpp = nch * (depth // 8)
    raw = b""
    prev = [0] * (w * bpp)
    for y in range(h):
        samples = [v for pxl in rows[y] for v in pxl]
        if depth == 16:
            line = [b for v in samples for b in ((v >> 8) & 0xFF, v & 0xFF)]
        else:
            line = samples
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
    z = zlib.compress(raw, 6)

    def chunk(typ, body):
        return (struct.pack(">I", len(body)) + typ + body
                + struct.pack(">I", binascii.crc32(typ + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
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

# gray16.png: color type 0 at 16 bits — BE sample pairs, bpp-2 unfilter
GW16, GH16 = 6, 4
g16 = [(x * 4099 + y * 12007) % 65536 for y in range(GH16) for x in range(GW16)]
write_png(os.path.join(OUT, "gray16.png"), GW16, GH16, 0,
          [[(g16[y * GW16 + x],) for x in range(GW16)] for y in range(GH16)],
          [2, 0, 4, 1, 3], depth=16)
print("gray16.png", stats(g16, 1, GW16, GH16))

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
