#!/usr/bin/env python3
"""Generate sample_mh.tif / sample_g3_1d.tif / sample_g3_2d.tif — an
INDEPENDENT G3-family encoder + TIFF wrapper pinning TiffCodec's
Compression-2/3 paths (tables and 2D coder imported from the sibling
gen_tiff_g4_fixture.py — they ARE the T.4 tables; this script adds
the T.4 line framings): the same 64x22 bilevel page in all three
files, photometric 0 (MinIsWhite), TWO strips of 12 rows, big-endian.

- sample_mh.tif:    Compression 2, every row 1D MH, byte-aligned
- sample_g3_1d.tif: Compression 3, EOL + 1D rows, two FILL bits
                    before every second EOL (T4Options 0)
- sample_g3_2d.tif: Compression 3, EOL + tag bit, K=3 cadence
                    (rows 0,3,6,... 1D; others 2D), T4Options 1
"""
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_tiff_g4_fixture import mh, transitions  # noqa: E402

FIX = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "graft", "fixtures")


def line_1d(row, w):
    bits = ""
    x, color = 0, 0
    while x < w:
        e = x
        while e < w and row[e] == color:
            e += 1
        bits += mh(e - x, color)
        x = e
        color ^= 1
    return bits


def line_2d(row, ref, w):
    cur = transitions(row, w)
    bits = ""
    a0, color = -1, 0
    while a0 < w:
        ci = 0
        while ci < len(cur) and cur[ci] <= a0:
            ci += 1
        a1 = cur[ci] if ci < len(cur) else w
        i1 = 0
        while i1 < len(ref) and (ref[i1] <= a0 or (i1 & 1) != color):
            i1 += 1
        b1 = ref[i1] if i1 < len(ref) else w
        b2 = ref[i1 + 1] if i1 + 1 < len(ref) else w
        if b2 < a1:
            bits += "0001"
            a0 = b2
        elif abs(a1 - b1) <= 3:
            bits += {0: "1", 1: "011", -1: "010", 2: "000011",
                     -2: "000010", 3: "0000011", -3: "0000010"}[a1 - b1]
            a0, color = a1, color ^ 1
        else:
            s = max(a0, 0)
            a2 = cur[ci + 1] if ci + 1 < len(cur) else w
            bits += "001" + mh(a1 - s, color) + mh(a2 - a1, color ^ 1)
            a0 = a2
    return bits


def pack(bits):
    pad = (8 - len(bits) % 8) % 8
    bits += "0" * pad
    return bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))


def enc_mh(rows, w):
    bits = ""
    for row in rows:
        line = line_1d(row, w)
        line += "0" * ((8 - len(line) % 8) % 8)  # byte-align per row
        bits += line
    return pack(bits)


def enc_g3(rows, w, two_d):
    bits = ""
    ref = [w, w]
    for y, row in enumerate(rows):
        if y % 2 == 1:
            bits += "00"  # fill bits: zeros swallowed by the EOL scan
        bits += "000000000001"  # EOL
        one_d = (not two_d) or (y % 3 == 0)
        if two_d:
            bits += "1" if one_d else "0"
        bits += line_1d(row, w) if one_d else line_2d(row, ref, w)
        ref = transitions(row, w)
    return pack(bits)


def page(w, h):
    rows = []
    for y in range(h):
        row = [0] * w
        for x in range(w):
            border = y in (0, h - 1) or x in (0, w - 1)
            blob = 8 <= y < 12 and (x * 5 + y) % 4 == 0
            row[x] = 1 if (border or blob or x == (3 * y) % w) else 0
        rows.append(row)
    return rows


def tiff(strips, w, h, rps, compression, t4options):
    data_start = 8
    offs, p = [], data_start
    for st in strips:
        offs.append(p)
        p += len(st)
    off_table = p
    cnt_table = off_table + 4 * len(strips)
    ifd_start = cnt_table + 4 * len(strips)
    out = bytearray(b"MM\x00\x2a" + struct.pack(">I", ifd_start))
    for st in strips:
        out += st
    for o in offs:
        out += struct.pack(">I", o)
    for st in strips:
        out += struct.pack(">I", len(st))

    def entry(tag, tpe, cnt, val, short_inline=False):
        if short_inline:
            return struct.pack(">HHIHH", tag, tpe, cnt, val, 0)
        return struct.pack(">HHII", tag, tpe, cnt, val)

    entries = [
        entry(256, 4, 1, w),
        entry(257, 4, 1, h),
        entry(258, 3, 1, 1, True),
        entry(259, 3, 1, compression, True),
        entry(262, 3, 1, 0, True),
        entry(273, 4, len(strips), off_table),
        entry(277, 3, 1, 1, True),
        entry(278, 4, 1, rps),
        entry(279, 4, len(strips), cnt_table),
    ]
    if t4options is not None:
        entries.append(entry(292, 4, 1, t4options))
    out += struct.pack(">H", len(entries))
    for e in entries:
        out += e
    out += struct.pack(">I", 0)
    return bytes(out)


def main():
    W, H, RPS = 64, 22, 12
    rows = page(W, H)
    spans = [rows[s:s + RPS] for s in range(0, H, RPS)]

    files = [
        ("sample_mh.tif", 2, None, [enc_mh(sp, W) for sp in spans]),
        ("sample_g3_1d.tif", 3, 0, [enc_g3(sp, W, False) for sp in spans]),
        ("sample_g3_2d.tif", 3, 1, [enc_g3(sp, W, True) for sp in spans]),
    ]
    for name, comp, t4, strips in files:
        with open(os.path.join(FIX, name), "wb") as f:
            f.write(tiff(strips, W, H, RPS, comp, t4))

    n_black = sum(sum(r) for r in rows)
    npx = W * H
    mean = 255.0 * (npx - n_black) / npx
    print(f"G3 fixtures: {W}x{H}, 2 strips, n_black={n_black}, "
          f"mean={mean!r} min=0 max=255")


if __name__ == "__main__":
    main()
