#!/usr/bin/env python3
"""Generate sample_rich.avro — an INDEPENDENT writer pinning the r20
Avro type extensions in sources/Avro.scala: a map<string,long> whose
second record arrives in TWO blocks with the negative-count
byte-size-prefixed form (the spec's skip-friendly framing), an enum
(varint index by symbol position), and a fixed(6) digest — deflate
codec so the inflate path composes with the new walks.

Records:
  0: id=20, attrs {x:7, y:-3} one block, color=blue (2), sig 6 bytes
  1: id=21, attrs {a:1} + {b:2} in two blocks, the SECOND with a
     negative count and byte-size prefix, color=red (0), sig 6 bytes
  2: id=22, attrs {} (bare terminator), color=green (1), sig 6 bytes
"""
import os
import zlib

FIX = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "graft", "fixtures")

SCHEMA = ('{"type":"record","name":"rich_rec","fields":['
          '{"name":"id","type":"long"},'
          '{"name":"attrs","type":{"type":"map","values":"long"}},'
          '{"name":"color","type":{"type":"enum","name":"c",'
          '"symbols":["red","green","blue"]}},'
          '{"name":"sig","type":{"type":"fixed","name":"f","size":6}}]}')
SYNC = bytes(range(7, 23))


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


def block(rec):
    comp = zlib.compressobj(wbits=-15)
    body = comp.compress(rec) + comp.flush()
    return vint(1) + vint(len(body)) + body + SYNC


def main():
    sig0 = bytes([1, 2, 3, 4, 5, 6])
    sig1 = bytes([0xAA, 0xBB, 0xCC, 0x00, 0x11, 0xFF])
    sig2 = bytes(6)
    r0 = (vint(20) + vint(2) + wstr("x") + vint(7) + wstr("y") + vint(-3)
          + vint(0) + vint(2) + sig0)
    # second map block uses the NEGATIVE-count + byte-size form
    blk2 = wstr("b") + vint(2)
    r1 = (vint(21) + vint(1) + wstr("a") + vint(1)
          + vint(-1) + vint(len(blk2)) + blk2
          + vint(0) + vint(0) + sig1)
    r2 = vint(22) + vint(0) + vint(1) + sig2

    hdr = (b"Obj\x01" + vint(2)
           + wstr("avro.schema") + wstr(SCHEMA)
           + wstr("avro.codec") + wstr("deflate")
           + vint(0) + SYNC)
    data = hdr + block(r0) + block(r1) + block(r2)
    with open(os.path.join(FIX, "sample_rich.avro"), "wb") as f:
        f.write(data)
    print("sample_rich.avro: expect attrs ['x=7,y=-3', 'a=1,b=2', ''], "
          "colors [blue, red, green], sigs [010203040506, aabbcc0011ff, "
          "000000000000]")


if __name__ == "__main__":
    main()
