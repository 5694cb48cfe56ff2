#!/usr/bin/env python3
"""Generate sample_g4.tif — an INDEPENDENT CCITT Group 4 (ITU-T T.6)
encoder + TIFF wrapper pinning TiffCodec's Compression-4 path (own
table transcription and 2D coder, big-endian TIFF to complement the
Scala LE builder): a 72x30 bilevel page — a black border, a diagonal,
and a dense textured band — photometric 0 (MinIsWhite), TWO strips of
16 rows (independent T.6 streams, partial last strip).

Expected stats (white=255 after the decoder's photometric handling):
computed below and printed for the spec.
"""
import os
import struct

FIX = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "graft", "fixtures")

WHITE_TERM = [
    "00110101", "000111", "0111", "1000", "1011", "1100", "1110", "1111",
    "10011", "10100", "00111", "01000", "001000", "000011", "110100",
    "110101", "101010", "101011", "0100111", "0001100", "0001000",
    "0010111", "0000011", "0000100", "0101000", "0101011", "0010011",
    "0100100", "0011000", "00000010", "00000011", "00011010", "00011011",
    "00010010", "00010011", "00010100", "00010101", "00010110", "00010111",
    "00101000", "00101001", "00101010", "00101011", "00101100", "00101101",
    "00000100", "00000101", "00001010", "00001011", "01010010", "01010011",
    "01010100", "01010101", "00100100", "00100101", "01011000", "01011001",
    "01011010", "01011011", "01001010", "01001011", "00110010", "00110011",
    "00110100"]
WHITE_MAKEUP = [
    "11011", "10010", "010111", "0110111", "00110110", "00110111",
    "01100100", "01100101", "01101000", "01100111", "011001100",
    "011001101", "011010010", "011010011", "011010100", "011010101",
    "011010110", "011010111", "011011000", "011011001", "011011010",
    "011011011", "010011000", "010011001", "010011010", "011000",
    "010011011"]
BLACK_TERM = [
    "0000110111", "010", "11", "10", "011", "0011", "0010", "00011",
    "000101", "000100", "0000100", "0000101", "0000111", "00000100",
    "00000111", "000011000", "0000010111", "0000011000", "0000001000",
    "00001100111", "00001101000", "00001101100", "00000110111",
    "00000101000", "00000010111", "00000011000", "000011001010",
    "000011001011", "000011001100", "000011001101", "000001101000",
    "000001101001", "000001101010", "000001101011", "000011010010",
    "000011010011", "000011010100", "000011010101", "000011010110",
    "000011010111", "000001101100", "000001101101", "000011011010",
    "000011011011", "000001010100", "000001010101", "000001010110",
    "000001010111", "000001100100", "000001100101", "000001010010",
    "000001010011", "000000100100", "000000110111", "000000111000",
    "000000100111", "000000101000", "000001011000", "000001011001",
    "000000101011", "000000101100", "000001011010", "000001100110",
    "000001100111"]
BLACK_MAKEUP = [
    "0000001111", "000011001000", "000011001001", "000001011011",
    "000000110011", "000000110100", "000000110101", "0000001101100",
    "0000001101101", "0000001001010", "0000001001011", "0000001001100",
    "0000001001101", "0000001110010", "0000001110011", "0000001110100",
    "0000001110101", "0000001110110", "0000001110111", "0000001010010",
    "0000001010011", "0000001010100", "0000001010101", "0000001011010",
    "0000001011011", "0000001100100", "0000001100101"]
EXT_MAKEUP = [
    "00000001000", "00000001100", "00000001101", "000000010010",
    "000000010011", "000000010100", "000000010101", "000000010110",
    "000000010111", "000000011100", "000000011101", "000000011110",
    "000000011111"]


def mh(run, color):
    term = WHITE_TERM if color == 0 else BLACK_TERM
    makeup = WHITE_MAKEUP if color == 0 else BLACK_MAKEUP
    bits = ""
    while run >= 2624:
        bits += EXT_MAKEUP[-1]
        run -= 2560
    if run >= 1792:
        i = (run - 1792) // 64
        bits += EXT_MAKEUP[i]
        run -= 1792 + 64 * i
    elif run >= 64:
        i = run // 64 - 1
        bits += makeup[i]
        run -= 64 * (i + 1)
    return bits + term[run]


def transitions(row, w):
    out = []
    prev = 0
    for x in range(w):
        if row[x] != prev:
            out.append(x)
            prev = row[x]
    out += [w, w]
    return out


def g4_encode(rows, w):
    bits = ""
    ref = [w, w]
    for row in rows:
        cur = transitions(row, w)
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
        ref = cur
    pad = (8 - len(bits) % 8) % 8
    bits += "0" * pad
    return bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))


def main():
    W, H, RPS = 72, 30, 16
    page = []
    for y in range(H):
        row = [0] * W
        for x in range(W):
            border = y in (0, H - 1) or x in (0, W - 1)
            diag = x == (y * 2 + 4) % W
            band = 12 <= y < 16 and (x * 7 + y) % 3 == 0
            row[x] = 1 if (border or diag or band) else 0
        page.append(row)

    strips = []
    for s0 in range(0, H, RPS):
        strips.append(g4_encode(page[s0:s0 + RPS], W))

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
        entry(256, 4, 1, W),
        entry(257, 4, 1, H),
        entry(258, 3, 1, 1, True),
        entry(259, 3, 1, 4, True),
        entry(262, 3, 1, 0, True),  # MinIsWhite
        entry(273, 4, len(strips), off_table),
        entry(277, 3, 1, 1, True),
        entry(278, 4, 1, RPS),
        entry(279, 4, len(strips), cnt_table),
    ]
    out += struct.pack(">H", len(entries))
    for e in entries:
        out += e
    out += struct.pack(">I", 0)

    with open(os.path.join(FIX, "sample_g4.tif"), "wb") as f:
        f.write(out)

    n_black = sum(sum(r) for r in page)
    npx = W * H
    mean = 255.0 * (npx - n_black) / npx
    print(f"sample_g4.tif: {W}x{H}, 2 strips, n_black={n_black}, "
          f"mean={mean!r} min=0 max=255")


if __name__ == "__main__":
    main()
