#!/usr/bin/env python3
"""Generate sample_pal.tif — an INDEPENDENT tiled palette-color TIFF
pinning TiffCodec's r19 extensions (hand-rolled per TIFF 6.0 §SS15 +
the ColorMap spec, big-endian to complement the Scala LE builder):
a 20x18 photometric-3 raster split into 2x2 tiles of 16x16 (edge
tiles zero-padded), uncompressed, whose indices alternate 0/1 by
(x+y) parity with colormap 0 -> (10,20,30), 1 -> (200,100,50)
(stored x257 as 16-bit).

Expected stats: 360 px; index 0 at even (x+y) = 180 px, index 1 at
180 px; r_mean = (10+200)/2 = 105.0, g_mean = 60.0, b_mean = 40.0,
px_min = 10, px_max = 200.
"""
import os
import struct

FIX = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "graft", "fixtures")

W, H, TW, TH = 20, 18, 16, 16


def main():
    across, down = (W + TW - 1) // TW, (H + TH - 1) // TH
    tiles = []
    for ty in range(down):
        for tx in range(across):
            t = bytearray(TW * TH)
            for r in range(TH):
                y = ty * TH + r
                if y >= H:
                    continue
                for c in range(TW):
                    x = tx * TW + c
                    if x < W:
                        t[r * TW + c] = (x + y) % 2
            tiles.append(bytes(t))

    data_start = 8
    offs = []
    p = data_start
    for t in tiles:
        offs.append(p)
        p += len(t)
    off_table = p
    cnt_table = off_table + 4 * len(tiles)
    cm_table = cnt_table + 4 * len(tiles)
    ifd_start = cm_table + 1536

    out = bytearray(b"MM\x00\x2a" + struct.pack(">I", ifd_start))
    for t in tiles:
        out += t
    for o in offs:
        out += struct.pack(">I", o)
    for t in tiles:
        out += struct.pack(">I", len(t))
    # colormap: 256 R then 256 G then 256 B, entries x257
    cm = [0] * 768
    cm[0], cm[256], cm[512] = 10, 20, 30
    cm[1], cm[257], cm[513] = 200, 100, 50
    for v in cm:
        out += struct.pack(">H", v * 257)

    def entry(tag, tpe, cnt, val, short_inline=False):
        if short_inline:
            return struct.pack(">HHIHH", tag, tpe, cnt, val, 0)
        return struct.pack(">HHII", tag, tpe, cnt, val)

    entries = [
        entry(256, 4, 1, W),
        entry(257, 4, 1, H),
        entry(258, 3, 1, 8, True),
        entry(259, 3, 1, 1, True),
        entry(262, 3, 1, 3, True),   # photometric: palette
        entry(277, 3, 1, 1, True),
        entry(320, 3, 768, cm_table),
        entry(322, 4, 1, TW),
        entry(323, 4, 1, TH),
        entry(324, 4, len(tiles), off_table),
        entry(325, 4, len(tiles), cnt_table),
    ]
    out += struct.pack(">H", len(entries))
    for e in entries:
        out += e
    out += struct.pack(">I", 0)

    with open(os.path.join(FIX, "sample_pal.tif"), "wb") as f:
        f.write(out)
    print("sample_pal.tif: MM tiled 20x18 palette, 2x2 tiles, "
          "r/g/b means 105/60/40, min 10 max 200")


if __name__ == "__main__":
    main()
