#!/usr/bin/env python3
"""Generate sample_ccitt.pdf — an INDEPENDENT scanned-PDF fixture
pinning Pdf's r20 /CCITTFaxDecode image path: one page embedding TWO
fax-coded bilevel XObjects, both python-encoded (the G4 coder and MH
tables come from gen_tiff_g4_fixture.py — not the Scala encoders):

- Im1: 72x30 page (border + diagonal + textured band, the sample_g4
  raster), /K -1 (G4). 321 black of 2160 px.
- Im2: 33x7 checker-ish raster, /K 0 with /EncodedByteAlign true
  (per-row byte-aligned 1D MH).

Expected: n_images=2, img_px=2160+231, byte sum = 255*(white pixels).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_tiff_g4_fixture import g4_encode, mh  # noqa: E402

FIX = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "graft", "fixtures")


def page_g4(w, h):
    rows = []
    for y in range(h):
        row = [0] * w
        for x in range(w):
            border = y in (0, h - 1) or x in (0, w - 1)
            diag = x == (y * 2 + 4) % w
            band = 12 <= y < 16 and (x * 7 + y) % 3 == 0
            row[x] = 1 if (border or diag or band) else 0
        rows.append(row)
    return rows


def mh_encode_aligned(rows, w):
    bits = ""
    for row in rows:
        line = ""
        x, color = 0, 0
        while x < w:
            e = x
            while e < w and row[e] == color:
                e += 1
            line += mh(e - x, color)
            x = e
            color ^= 1
        line += "0" * ((8 - len(line) % 8) % 8)
        bits += line
    return bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))


def main():
    W1, H1 = 72, 30
    rows1 = page_g4(W1, H1)
    im1 = g4_encode(rows1, W1)
    W2, H2 = 33, 7
    rows2 = [[1 if (x + 2 * y) % 5 < 2 else 0 for x in range(W2)]
             for y in range(H2)]
    im2 = mh_encode_aligned(rows2, W2)

    content = (b"BT /F1 12 Tf 72 720 Td (fax images) Tj ET "
               b"q 96 0 0 96 72 560 cm /Im1 Do Q q 48 0 0 48 72 500 cm /Im2 Do Q")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> "
        b"/XObject << /Im1 6 0 R /Im2 7 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
        b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
        b"/Filter /CCITTFaxDecode "
        b"/DecodeParms << /K -1 /Columns %d /Rows %d >> "
        b"/Length %d >>\nstream\n" % (W1, H1, W1, H1, len(im1))
        + im1 + b"\nendstream",
        b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
        b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
        b"/Filter /CCITTFaxDecode "
        b"/DecodeParms << /K 0 /Columns %d /Rows %d /EncodedByteAlign true >> "
        b"/Length %d >>\nstream\n" % (W2, H2, W2, H2, len(im2))
        + im2 + b"\nendstream",
    ]
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
    with open(os.path.join(FIX, "sample_ccitt.pdf"), "wb") as f:
        f.write(pdf)

    black1 = sum(sum(r) for r in rows1)
    black2 = sum(sum(r) for r in rows2)
    px = W1 * H1 + W2 * H2
    bsum = 255 * (W1 * H1 - black1) + 255 * (W2 * H2 - black2)
    print(f"sample_ccitt.pdf: n_images=2 img_px={px} byte_sum={bsum} "
          f"(black {black1}+{black2})")


if __name__ == "__main__":
    main()
