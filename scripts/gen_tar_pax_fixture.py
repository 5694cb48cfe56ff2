#!/usr/bin/env python3
"""Generate sample_pax.tar — an INDEPENDENT pax-format archive pinning
Archive.readTar's 'x'/'g' extended-header walk (python's stdlib
tarfile, not the Scala writer):

- a 'g' global header (pax_headers at open) carrying an ignorable key
- long.txt: PAX_FORMAT member whose 130-char path forces tarfile to
  emit an 'x' header with a `path` record (the ustar name truncates)
- forced.txt: an 'x' header with an explicit `size` record AND a
  hand-patched ustar size field of 0 — the GNU >8 GiB convention —
  so the reader must take the size from the pax record to extract
- plain.txt: an ordinary ustar member after the pax ones, proving the
  'x' state was consumed (method ustar) while the 'g' global persists
"""
import io
import os
import tarfile

FIX = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "graft", "fixtures")

LONG_NAME = "paxdir/" + "q" * 115 + "/long.txt"
LONG_DATA = b"pax long-path payload"
FORCED_DATA = b"forced-size payload via pax record"
PLAIN_DATA = b"plain ustar member"


def member(t, name, data, pax_headers=None):
    ti = tarfile.TarInfo(name)
    ti.size = len(data)
    if pax_headers:
        ti.pax_headers = dict(pax_headers)
    t.addfile(ti, io.BytesIO(data))


def main():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.PAX_FORMAT,
                      pax_headers={"graft.fixture": "pax"}) as t:
        member(t, LONG_NAME, LONG_DATA)
        member(t, "forced.txt", FORCED_DATA,
               pax_headers={"size": str(len(FORCED_DATA))})
        member(t, "plain.txt", PLAIN_DATA)
    raw = bytearray(buf.getvalue())

    # hand-patch forced.txt's ustar size field to 0 (the pax `size`
    # record must win): find its data header and rewrite the octal
    # field + checksum
    off = 0
    while off + 512 <= len(raw):
        block = raw[off:off + 512]
        if all(b == 0 for b in block):
            off += 512
            continue
        name = bytes(block[0:100]).split(b"\x00")[0]
        typeflag = block[156:157]
        size = int(bytes(block[124:136]).split(b"\x00")[0].strip() or b"0", 8)
        if name == b"forced.txt" and typeflag in (b"0", b"\x00"):
            raw[off + 124:off + 136] = b"00000000000\x00"
            chk = sum(raw[off + i] if not (148 <= i < 156) else 0x20
                      for i in range(512))
            raw[off + 148:off + 156] = ("%06o" % chk).encode() + b"\x00 "
        off += 512 + ((size + 511) // 512) * 512

    with open(os.path.join(FIX, "sample_pax.tar"), "wb") as f:
        f.write(bytes(raw))
    print("sample_pax.tar: global 'g' + pax long path + forced pax size"
          f" (ustar field 0) + plain member; long name = {len(LONG_NAME)} chars")

    # sample_base256.tar: a plain ustar archive whose size field is
    # hand-rewritten to the GNU base-256 binary form (0x80 flag +
    # big-endian bytes) — the non-pax >8 GiB convention, here carrying
    # a small size so the data is real
    buf2 = io.BytesIO()
    with tarfile.open(fileobj=buf2, mode="w",
                      format=tarfile.USTAR_FORMAT) as t:
        member(t, "binary.txt", b"base-256 sized payload")
    raw2 = bytearray(buf2.getvalue())
    n = len(b"base-256 sized payload")
    field = bytearray(12)
    field[0] = 0x80
    field[4:12] = n.to_bytes(8, "big")
    raw2[124:136] = field
    chk = sum(raw2[i] if not (148 <= i < 156) else 0x20 for i in range(512))
    raw2[148:156] = ("%06o" % chk).encode() + b"\x00 "
    with open(os.path.join(FIX, "sample_base256.tar"), "wb") as f:
        f.write(bytes(raw2))
    print(f"sample_base256.tar: binary size field for {n} bytes")


if __name__ == "__main__":
    main()
