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

# ASCIIHexDecode stream (odd whitespace inside the hex body is legal)
content3 = b"BT (HEXED stream ok) Tj ET"
hex3 = binascii.hexlify(content3).upper()
hex3 = hex3[:10] + b"\n " + hex3[10:] + b">"
# [/ASCII85Decode /FlateDecode] chain: deflate then a85 (with zero
# groups in the deflate output exercising the z shortcut when present)
content4 = b"BT (chained A85+Flate ok) Tj ET"
a85_4 = base64.a85encode(zlib.compress(content4, 6)) + b"~>"

objs = []
objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
objs.append(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
objs.append(b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents [4 0 R 6 0 R 7 0 R 8 0 R] "
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
            + "HEXED stream ok" + "chained A85+Flate ok")
print("sample.pdf", dict(n_streams=4, n_flate=2, n_raw=1, n_ascii=2,
                         n_shows=7, text=expected))
