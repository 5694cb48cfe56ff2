#!/usr/bin/env python3
"""Generate sample_jpeg.tif + sample_jpeg_tables.tif — INDEPENDENT
new-style JPEG-in-TIFF (Compression 7) fixtures pinning TiffCodec's
r20 path (the JPEG stream comes from gen_image_fixtures.py's own
encoder, not the Scala one): a 24x16 grayscale flat-tile page
(exactly invertible: unit quant, DC-only blocks) wrapped as a
single-strip big-endian TIFF —

- sample_jpeg.tif:        self-contained strip
- sample_jpeg_tables.tif: the TIFF/EP shared-tables form — DQT/DHT
  segments moved to a tag-347 JPEGTables stream (SOI..EOI), the
  strip abbreviated; the reader must splice them back

Expected stats printed below (identical for both files).
"""
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import gen_image_fixtures as gi  # noqa: E402

FIX = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "graft", "fixtures")


def split_tables(jpeg):
    """Move DQT (FFDB) / DHT (FFC4) segments into an SOI..EOI tables
    stream; keep everything else (the abbreviated strip)."""
    assert jpeg[0:2] == b"\xff\xd8"
    tables = bytearray(b"\xff\xd8")
    rest = bytearray(b"\xff\xd8")
    p = 2
    while p < len(jpeg):
        assert jpeg[p] == 0xFF, f"lost marker sync at {p}"
        m = jpeg[p + 1]
        if m == 0xD9:
            rest += b"\xff\xd9"
            break
        if m == 0xDA:  # SOS: entropy data to EOI
            rest += jpeg[p:]
            break
        seglen = struct.unpack(">H", jpeg[p + 2:p + 4])[0]
        seg = jpeg[p:p + 2 + seglen]
        (tables if m in (0xDB, 0xC4) else rest).extend(seg)
        p += 2 + seglen
    tables += b"\xff\xd9"
    return bytes(tables), bytes(rest)


def tiff_wrap(strip, w, h, tables=None):
    data_start = 8
    tbl_off = data_start + len(strip)
    ifd_start = tbl_off + (len(tables) if tables else 0)
    out = bytearray(b"MM\x00\x2a" + struct.pack(">I", ifd_start))
    out += strip
    if tables:
        out += tables

    def entry(tag, tpe, cnt, val):
        return struct.pack(">HHII", tag, tpe, cnt, val)

    def short_entry(tag, val):
        return struct.pack(">HHIHH", tag, 3, 1, val, 0)

    entries = [
        entry(256, 4, 1, w),
        entry(257, 4, 1, h),
        short_entry(258, 8),
        short_entry(259, 7),   # new-style JPEG
        short_entry(262, 1),   # gray
        entry(273, 4, 1, data_start),
        short_entry(277, 1),
        entry(278, 4, 1, h),
        entry(279, 4, 1, len(strip)),
    ]
    if tables:
        entries.append(entry(347, 7, len(tables), tbl_off))
    out += struct.pack(">H", len(entries))
    for e in entries:
        out += e
    out += struct.pack(">I", 0)
    return bytes(out)


def main():
    W, H = 24, 16
    FT = [3, 250, 17, 128, 201, 77]
    plane = [[FT[(y // 8) * 3 + x // 8] for x in range(W)] for y in range(H)]
    tmp = os.path.join(FIX, "_tmp_jit.jpg")
    dec = gi.encode_jpeg(tmp, W, H,
                         [dict(plane=plane, pw=W, hf=1, vf=1, q=gi.UNIT_Q)])
    jpeg = open(tmp, "rb").read()
    os.remove(tmp)
    fs = [dec[0][y][x] for y in range(H) for x in range(W)]
    assert fs == [v for row in plane for v in row], "tiles must invert exactly"

    with open(os.path.join(FIX, "sample_jpeg.tif"), "wb") as f:
        f.write(tiff_wrap(jpeg, W, H))
    tables, abbrev = split_tables(jpeg)
    with open(os.path.join(FIX, "sample_jpeg_tables.tif"), "wb") as f:
        f.write(tiff_wrap(abbrev, W, H, tables))
    mean = sum(fs) / len(fs)
    print(f"sample_jpeg[_tables].tif: {W}x{H} gray, mean={mean!r} "
          f"min={min(fs)} max={max(fs)}; tables stream {len(tables)} bytes")


if __name__ == "__main__":
    main()
