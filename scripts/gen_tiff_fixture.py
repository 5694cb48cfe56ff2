#!/usr/bin/env python3
"""Generate scan.tiff — an INDEPENDENT baseline-TIFF writer pinning
TiffCodec against a second implementation: BIG-endian (MM), grayscale,
PhotometricInterpretation 0 (WhiteIsZero — the decoder must INVERT
samples), PackBits compression restarting per row, RowsPerStrip 3
over a 7x8 raster (3 strips, partial last), strip tables out of line.

Raster: v(x, y) = (x * 29 + y * 17) % 251 stored; decoder reports
255 - v. Expected stats printed for the spec.
"""
import os
import struct

FIX = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "graft", "fixtures")

W, H, RPS = 7, 8, 3


def packbits(row):
    out = bytearray()
    i = 0
    while i < len(row):
        run = 1
        while i + run < len(row) and row[i + run] == row[i] and run < 128:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(row[i])
            i += run
        else:
            j = i
            lit = 0
            while j < len(row) and lit < 128:
                r = 1
                while j + r < len(row) and row[j + r] == row[j] and r < 3:
                    r += 1
                if r >= 3:
                    break
                j += 1
                lit += 1
            out.append(lit - 1)
            out.extend(row[i:j])
            i = j
    return bytes(out)


def main():
    raster = [[(x * 29 + y * 17) % 251 for x in range(W)] for y in range(H)]
    strips = []
    for s in range((H + RPS - 1) // RPS):
        rows = raster[s * RPS:(s + 1) * RPS]
        strips.append(b"".join(packbits(bytes(r)) for r in rows))

    out = bytearray(b"MM\x00\x2a")
    data_start = 8
    offs = []
    pos = data_start
    for s in strips:
        offs.append(pos)
        pos += len(s)
    off_table = pos
    cnt_table = off_table + 4 * len(strips)
    ifd = cnt_table + 4 * len(strips)
    out += struct.pack(">I", ifd)
    for s in strips:
        out += s
    for o in offs:
        out += struct.pack(">I", o)
    for s in strips:
        out += struct.pack(">I", len(s))

    def entry(tag, tpe, count, value):
        if tpe == 3 and count == 1:
            return struct.pack(">HHIHH", tag, tpe, count, value, 0)
        return struct.pack(">HHII", tag, tpe, count, value)

    entries = [
        entry(256, 4, 1, W),
        entry(257, 4, 1, H),
        entry(258, 3, 1, 8),
        entry(259, 3, 1, 32773),
        entry(262, 3, 1, 0),  # WhiteIsZero
        entry(273, 4, len(strips), off_table),
        entry(277, 3, 1, 1),
        entry(278, 4, 1, RPS),
        entry(279, 4, len(strips), cnt_table),
    ]
    out += struct.pack(">H", len(entries))
    for e in entries:
        out += e
    out += struct.pack(">I", 0)
    with open(os.path.join(FIX, "scan.tiff"), "wb") as f:
        f.write(out)
    inv = [255 - v for row in raster for v in row]
    print("scan.tiff: mean", sum(inv) / len(inv), "min", min(inv), "max", max(inv))


if __name__ == "__main__":
    main()
