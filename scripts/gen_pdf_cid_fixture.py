#!/usr/bin/env python3
"""Generate sample_cid.pdf — an INDEPENDENT composite-font PDF (not
the Scala buildPdfCid path): Type0/Identity-H font whose ToUnicode
CMap maps code = codepoint XOR 0x00A5 (a mapping the Scala builder
never uses) via one bfrange per contiguous run plus bfchar specials,
content shown as one hex Tj and one TJ array, CMap object BEFORE the
content stream (the Scala builder places it after — both orders must
extract). Expected text: 'CID fixture: mapped!'.
"""
import os
import zlib

FIX = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "graft", "fixtures")

TEXT = "CID fixture: mapped!"


def enc(ch):
    return ord(ch) ^ 0x00A5


def main():
    # bfchar entries for every distinct char (simplest exact mapping)
    chars = sorted(set(TEXT))
    bfchar = "\n".join(f"<{enc(c):04X}> <{ord(c):04X}>" for c in chars)
    cmap = (
        "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        f"{len(chars)} beginbfchar\n{bfchar}\nendbfchar\n"
        "endcmap\nCMap currentdict /CMap defineresource pop\nend end\n"
    ).encode("latin-1")
    head = TEXT[:8]
    tail = TEXT[8:]
    hexs = lambda s: "".join(f"{enc(c):04X}" for c in s)
    content = (f"BT /F1 10 Tf 72 720 Td <{hexs(head)}> Tj "
               f"[<{hexs(tail[:5])}> -30 <{hexs(tail[5:])}>] TJ ET").encode("latin-1")
    content_z = zlib.compress(content)

    out = bytearray(b"%PDF-1.4\n")
    offsets = {}

    def obj(num, payload):
        offsets[num] = len(out)
        out.extend(payload)

    obj(1, b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    obj(2, b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    obj(3, b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Contents 5 0 R /Resources << /Font << /F1 6 0 R >> >> >>\nendobj\n")
    obj(4, b"4 0 obj\n<< /Length " + str(len(cmap)).encode() +
           b" >>\nstream\n" + cmap + b"\nendstream\nendobj\n")
    obj(5, b"5 0 obj\n<< /Length " + str(len(content_z)).encode() +
           b" /Filter /FlateDecode >>\nstream\n" + content_z + b"\nendstream\nendobj\n")
    obj(6, b"6 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /Fixture "
           b"/Encoding /Identity-H /ToUnicode 4 0 R >>\nendobj\n")
    xref = len(out)
    out.extend(b"xref\n0 7\n0000000000 65535 f \n")
    for k in range(1, 7):
        out.extend(f"{offsets[k]:010d} 00000 n \n".encode())
    out.extend(b"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n" +
               str(xref).encode() + b"\n%%EOF\n")
    with open(os.path.join(FIX, "sample_cid.pdf"), "wb") as f:
        f.write(out)
    print("sample_cid.pdf: expect text", repr(TEXT))


if __name__ == "__main__":
    main()
