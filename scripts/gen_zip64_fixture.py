#!/usr/bin/env python3
"""Generate sample64.zip — an INDEPENDENT Zip64 writer pinning
sources/Archive.scala's r19 walk (hand-rolled per APPNOTE 4.5/4.6.3,
not python zipfile, which only masks at real 4 GiB/65k thresholds):
two entries (one stored, one raw-deflate) whose central records mask
size/size/offset to 0xFFFFFFFF and carry the values in 0x0001 extras
— PRECEDED by a 0x5455 extra the walk must skip — plus a Zip64 EOCD
record, its locator, and a fully masked classic EOCD.
"""
import os
import struct
import zlib

FIX = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "graft", "fixtures")


def local(name, data, method, stored):
    return (struct.pack("<IHHHHHIIIHH", 0x04034B50, 45, 0, method, 0, 0,
                        zlib.crc32(data), len(stored), len(data),
                        len(name), 0) + name.encode() + stored)


def central(name, data, method, stored, offset):
    ut = struct.pack("<HHBI", 0x5455, 5, 1, 0)  # extra to be skipped
    z64 = struct.pack("<HHQQQ", 0x0001, 24, len(data), len(stored), offset)
    extra = ut + z64
    return (struct.pack("<IHHHHHHIIIHHHHHII", 0x02014B50, 45, 45, 0, method,
                        0, 0, zlib.crc32(data), 0xFFFFFFFF, 0xFFFFFFFF,
                        len(name), len(extra), 0, 0, 0, 0, 0xFFFFFFFF)
            + name.encode() + extra)


def main():
    d1 = b"stored entry payload"
    d2 = b"deflated entry payload, deflated entry payload"
    c2 = zlib.compressobj(wbits=-15)
    z2 = c2.compress(d2) + c2.flush()

    out = bytearray()
    off1 = len(out)
    out += local("a_stored.txt", d1, 0, d1)
    off2 = len(out)
    out += local("b_deflate.txt", d2, 8, z2)
    cd_start = len(out)
    out += central("a_stored.txt", d1, 0, d1, off1)
    out += central("b_deflate.txt", d2, 8, z2, off2)
    cd_size = len(out) - cd_start

    z64_at = len(out)
    out += struct.pack("<IQHHIIQQQQ", 0x06064B50, 44, 45, 45, 0, 0,
                       2, 2, cd_size, cd_start)
    out += struct.pack("<IIQI", 0x07064B50, 0, z64_at, 1)  # locator
    out += struct.pack("<IHHHHIIH", 0x06054B50, 0, 0, 0xFFFF, 0xFFFF,
                       0xFFFFFFFF, 0xFFFFFFFF, 0)

    with open(os.path.join(FIX, "sample64.zip"), "wb") as f:
        f.write(out)
    print("sample64.zip: 2 entries (stored+deflate), masked central "
          "records with skipped 0x5455 + 0x0001 extras, EOCD64+locator")


if __name__ == "__main__":
    main()
