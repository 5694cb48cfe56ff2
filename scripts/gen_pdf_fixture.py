#!/usr/bin/env python3
"""Generate the committed PDF fixture under src/test/resources/graft/fixtures
and print the exact text PdfSpec pins. INDEPENDENT writer (python zlib +
hand-built xref), so a Scala encoder/extractor bug pair cannot cancel.
Deterministic - re-running must reproduce the committed bytes bit-for-bit.
Driver-side tooling only; never a library dependency.
"""
import base64
import binascii
import os
import zlib

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources",
                   "graft", "fixtures")
os.makedirs(OUT, exist_ok=True)

# Two content streams: one Flate (Tj + TJ with escapes), one raw (octal +
# nested parens + a comment + a whitespace-split odd-digit hex show +
# the ' and " show operators).
content1 = (b"BT /F1 12 Tf 72 720 Td (Fixture \\(one\\): back\\\\slash) Tj "
            b"[(ab c) -40 (def)] TJ ET")
content2 = (b"BT % a comment with (parens) to skip\n"
            b"<48 65\n78 21 4> Tj (oct\\101l (nested) keep) ' 0 0 (qq) \" ET")
z1 = zlib.compress(content1, 6)

def lzw_encode(data):
    """Independent TIFF-flavor LZW encoder (EarlyChange 1), width driven
    by a mirror of the DECODER's table state as the PDF spec implies —
    NOT a port of the Scala encoder, so a shared width-schedule bug
    cannot cancel."""
    codes = []  # (code,) emitted data codes after the opening CLEAR
    dict_ = {}
    size = 258
    cur = b""
    for bch in data:
        nxt = cur + bytes([bch])
        if len(nxt) == 1 or nxt in dict_:
            cur = nxt
        else:
            codes.append(dict_[cur] if len(cur) > 1 else cur[0])
            if size < 4095:
                dict_[nxt] = size
                size += 1
            cur = bytes([bch])
    if cur:
        codes.append(dict_[cur] if len(cur) > 1 else cur[0])
    # pack: CLEAR at 9 bits, then data codes at the decoder's width
    # (its table slot before reading code j is 258 + max(0, j-1)), EOD
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code, width):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    def width_at(dec_next):
        w = 9
        while w < 12 and dec_next >= (1 << w) - 1:
            w += 1
        return w

    put(256, 9)
    for j, code in enumerate(codes):
        put(code, width_at(258 + max(0, j - 1)))
    put(257, width_at(258 + max(0, len(codes) - 1)))
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# ASCIIHexDecode stream (odd whitespace inside the hex body is legal)
content3 = b"BT (HEXED stream ok) Tj ET"
hex3 = binascii.hexlify(content3).upper()
hex3 = hex3[:10] + b"\n " + hex3[10:] + b">"
# [/ASCII85Decode /FlateDecode] chain: deflate then a85 (with zero
# groups in the deflate output exercising the z shortcut when present)
content4 = b"BT (chained A85+Flate ok) Tj ET"
a85_4 = base64.a85encode(zlib.compress(content4, 6)) + b"~>"
# LZWDecode stream long enough to cross the 511-entry width boundary
# (pseudorandom bracket-free ASCII payload, deterministic)
lzw_text = bytes(32 + ((i * 7919) % 90) for i in range(1400))
lzw_text = lzw_text.replace(b"(", b"_").replace(b")", b"_").replace(b"\\", b"_")
content5 = b"BT (" + lzw_text + b") Tj ET"
lzw_5 = lzw_encode(content5)

objs = []
objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
objs.append(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
objs.append(b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents [4 0 R 6 0 R 7 0 R 8 0 R 9 0 R] "
            b"/Resources << /Font << /F1 5 0 R >> >> >>")
objs.append(b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(z1)
            + z1 + b"\nendstream")
objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
objs.append(b"<< /Length %d >>\nstream\n" % len(content2)
            + content2 + b"\nendstream")
objs.append(b"<< /Length %d /Filter /ASCIIHexDecode >>\nstream\n" % len(hex3)
            + hex3 + b"\nendstream")
objs.append(b"<< /Length %d /Filter [/ASCII85Decode /FlateDecode] >>\nstream\n"
            % len(a85_4) + a85_4 + b"\nendstream")
objs.append(b"<< /Length %d /Filter /LZWDecode >>\nstream\n"
            % len(lzw_5) + lzw_5 + b"\nendstream")

pdf = b"%PDF-1.4\n"
offsets = [0]
for i, o in enumerate(objs, start=1):
    offsets.append(len(pdf))
    pdf += b"%d 0 obj\n" % i + o + b"\nendobj\n"
xref = len(pdf)
pdf += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
for off in offsets[1:]:
    pdf += b"%010d 00000 n \n" % off
pdf += b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (
    len(objs) + 1, xref)

with open(os.path.join(OUT, "sample.pdf"), "wb") as f:
    f.write(pdf)

expected = ("Fixture (one): back\\slash" + "ab c" + "def"
            + "Hex!@" + "octAl (nested) keep" + "qq"
            + "HEXED stream ok" + "chained A85+Flate ok"
            + lzw_text.decode("latin-1"))
print("sample.pdf", dict(n_streams=5, n_flate=2, n_raw=1, n_ascii=2,
                         n_shows=8, lzw_head=lzw_text[:24].decode("latin-1"),
                         text_len=len(expected)))

# ---- sample_img.pdf: image XObjects (r18) ---------------------------
# Embeds (a) the committed flat.jpg (itself python-encoded by
# gen_image_fixtures.py - an independent JPEG) behind /DCTDecode and
# (b) a 4x3 DeviceRGB raster of bytes 0..35 behind /FlateDecode, plus
# one raw content stream. PdfSpec pins: text untouched by the rasters,
# n_images=2, img_px = flat.jpg pixels + 12, and the byte-sum contract.
with open(os.path.join(OUT, "flat.jpg"), "rb") as f:
    flat_jpg = f.read()
raster = bytes(range(36))  # 4x3 RGB, bytes 0..35
z_raster = zlib.compress(raster, 6)
content_i = b"BT /F1 12 Tf 72 720 Td (with images) Tj ET q 96 0 0 96 72 560 cm /Im1 Do Q"

iobjs = []
iobjs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
iobjs.append(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
iobjs.append(b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> "
             b"/XObject << /Im1 6 0 R /Im2 7 0 R >> >> >>")
iobjs.append(b"<< /Length %d >>\nstream\n" % len(content_i)
             + content_i + b"\nendstream")
iobjs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
iobjs.append(b"<< /Type /XObject /Subtype /Image /Width 24 /Height 16 "
             b"/ColorSpace /DeviceGray /BitsPerComponent 8 "
             b"/Filter /DCTDecode /Length %d >>\nstream\n" % len(flat_jpg)
             + flat_jpg + b"\nendstream")
iobjs.append(b"<< /Type /XObject /Subtype /Image /Width 4 /Height 3 "
             b"/ColorSpace /DeviceRGB /BitsPerComponent 8 "
             b"/Filter /FlateDecode /Length %d >>\nstream\n" % len(z_raster)
             + z_raster + b"\nendstream")

ipdf = b"%PDF-1.4\n"
ioffsets = [0]
for i, o in enumerate(iobjs, start=1):
    ioffsets.append(len(ipdf))
    ipdf += b"%d 0 obj\n" % i + o + b"\nendobj\n"
ixref = len(ipdf)
ipdf += b"xref\n0 %d\n0000000000 65535 f \n" % (len(iobjs) + 1)
for off in ioffsets[1:]:
    ipdf += b"%010d 00000 n \n" % off
ipdf += b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (
    len(iobjs) + 1, ixref)

with open(os.path.join(OUT, "sample_img.pdf"), "wb") as f:
    f.write(ipdf)
print("sample_img.pdf", dict(n_streams=3, n_images=2,
                             raster_mean=sum(raster) / len(raster),
                             text="with images"))

# ---- sample_modern.pdf: ObjStm + xref STREAM (r18) -------------------
# The modern-writer layout: catalog/pages/page/font dicts packed in a
# Flate /ObjStm, content stream top-level, and a /Type /XRef stream
# (W [1 4 2], Flate + PNG Up predictor 12) instead of a classic table.
# Independent writer - PdfSpec pins text + the structure counters.
content_m = b"BT /F1 12 Tf 72 720 Td (modern container) Tj (!) ' ET"
inner = [
    (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
    (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
    (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"),
    (5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
]
offs, acc = [], 0
for _, o in inner:
    offs.append(acc)
    acc += len(o) + 1
header = (" ".join("%d %d" % (n, off) for (n, _), off in zip(inner, offs))
          + "\n").encode()
objstm_raw = header + b"\n".join(o for _, o in inner) + b"\n"
objstm_z = zlib.compress(objstm_raw, 6)

mpdf = bytearray(b"%PDF-1.5\n")
off4 = len(mpdf)
mpdf += (b"4 0 obj\n<< /Length %d >>\nstream\n" % len(content_m)
         + content_m + b"\nendstream\nendobj\n")
off6 = len(mpdf)
mpdf += (b"6 0 obj\n<< /Type /ObjStm /N 4 /First %d /Filter /FlateDecode "
         b"/Length %d >>\nstream\n" % (len(header), len(objstm_z))
         + objstm_z + b"\nendstream\nendobj\n")
off7 = len(mpdf)

def xrow(t, f2, f3):
    return bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")

xrows = [xrow(0, 0, 0xFFFF), xrow(2, 6, 0), xrow(2, 6, 1), xrow(2, 6, 2),
         xrow(1, off4, 0), xrow(2, 6, 3), xrow(1, off6, 0), xrow(1, off7, 0)]
pred_rows = bytearray()
prev = bytes(7)
for r in xrows:
    pred_rows.append(2)  # PNG Up
    pred_rows += bytes((r[i] - prev[i]) & 0xFF for i in range(7))
    prev = r
xref_z = zlib.compress(bytes(pred_rows), 6)
mpdf += (b"7 0 obj\n<< /Type /XRef /Size 8 /Root 1 0 R /W [1 4 2] "
         b"/Index [0 8] /Filter /FlateDecode "
         b"/DecodeParms << /Predictor 12 /Columns 7 >> /Length %d >>\nstream\n"
         % len(xref_z) + xref_z + b"\nendstream\nendobj\n")
mpdf += b"startxref\n%d\n%%%%EOF\n" % off7

with open(os.path.join(OUT, "sample_modern.pdf"), "wb") as f:
    f.write(bytes(mpdf))
print("sample_modern.pdf", dict(n_streams=3, n_objstm=1, n_objstm_objs=4,
                                n_pages=1, n_xref_offsets=3,
                                n_xref_compressed=4,
                                text="modern container!"))
