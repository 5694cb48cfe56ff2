#!/usr/bin/env python3
"""Generate sample.avro — an INDEPENDENT Avro object-container writer
pinning sources/Avro.scala: a 5-field schema covering every in-scope
primitive (long, int, string, boolean, double), a metadata map written
as a NEGATIVE-count block (abs count + byte size — the spec's skip
form), deflate codec, two blocks (2 records + 1 record).

Records: (i, i*i, 'rec<i>', i%2==0, i*0.5) for i in 0..2.
"""
import os
import struct
import zlib

FIX = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "graft", "fixtures")

SCHEMA = ('{"type":"record","name":"pinned","fields":['
          '{"name":"a","type":"long"},{"name":"b","type":"int"},'
          '{"name":"c","type":"string"},{"name":"d","type":"boolean"},'
          '{"name":"e","type":"double"}]}')
SYNC = bytes(range(16))


def vint(v):
    u = (v << 1) ^ (v >> 63) if v >= 0 else ((-v) * 2 - 1)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def wstr(s):
    b = s.encode()
    return vint(len(b)) + b


def record(i):
    return (vint(i) + vint(i * i) + wstr(f"rec{i}") +
            bytes([1 if i % 2 == 0 else 0]) + struct.pack("<d", i * 0.5))


def block(recs):
    body = b"".join(recs)
    z = zlib.compressobj(wbits=-15)
    comp = z.compress(body) + z.flush()
    return vint(len(recs)) + vint(len(comp)) + comp + SYNC


def main():
    meta_entries = wstr("avro.schema") + wstr(SCHEMA) + \
        wstr("avro.codec") + wstr("deflate")
    # negative-count map block: -2 entries + byte size, then terminator
    meta = vint(-2) + vint(len(meta_entries)) + meta_entries + vint(0)
    out = b"Obj\x01" + meta + SYNC + \
        block([record(0), record(1)]) + block([record(2)])
    with open(os.path.join(FIX, "sample.avro"), "wb") as f:
        f.write(out)
    print("sample.avro: 2 blocks, 3 records, deflate, negative-count meta")


if __name__ == "__main__":
    main()
