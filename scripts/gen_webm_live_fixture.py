#!/usr/bin/env python3
"""Generate sample_live.webm — an INDEPENDENT live-muxed WebM builder
pinning WebmMeta's r20 duration fallback (hand-rolled per RFC 8794,
no mkv lib): EBML header, UNKNOWN-size Segment, Info WITHOUT a
Duration element (the streaming-muxer layout), a V_VP9 320x180 track,
then TWO clusters — the first known-size (Timestamp 1000, SimpleBlocks
at +5/+10), the second UNKNOWN-size (Timestamp 2000, one SimpleBlock
at +34 with a 2-byte track varint, then a BlockGroup-wrapped Block
at +47, then junk frame bytes). Expected duration_ms = 2000 + 47 =
2047 at the default 1 ms scale; the walk must take the LAST
cluster/block (incl. the BlockGroup form), reset relative times per
cluster, and strip the wider 2-byte track varint; the unknown-size
SECOND cluster runs to EOF.
"""
import os
import struct

FIX = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "graft", "fixtures")


def ebml_id(v):
    n = max(1, (v.bit_length() + 7) // 8)
    return v.to_bytes(n, "big")


def ebml_size(v):
    n = 1
    while n < 8 and v >= (1 << (7 * n)) - 1:
        n += 1
    out = bytearray(v.to_bytes(n, "big"))
    out[0] |= 0x80 >> (n - 1)
    return bytes(out)


def el(i, payload):
    return ebml_id(i) + ebml_size(len(payload)) + payload


def uint(v):
    n = max(1, (v.bit_length() + 7) // 8)
    return v.to_bytes(n, "big")


def simple_block(track_varint, rel, frame):
    return el(0xA3, track_varint + struct.pack(">h", rel) + b"\x80" + frame)


def block_group(track_varint, rel, frame):
    return el(0xA0, el(0xA1, track_varint + struct.pack(">h", rel)
                       + b"\x00" + frame))


def main():
    header = el(0x1A45DFA3,
                el(0x4286, uint(1)) + el(0x42F7, uint(1)) +
                el(0x42F2, uint(4)) + el(0x42F3, uint(8)) +
                el(0x4282, b"webm") + el(0x4287, uint(4)) +
                el(0x4285, uint(2)))
    info = el(0x1549A966, el(0x2AD7B1, uint(1000000)))  # NO Duration
    video = el(0xAE,
               el(0xD7, uint(1)) + el(0x73C5, uint(1)) +
               el(0x83, uint(1)) + el(0x86, b"V_VP9") +
               el(0xE0, el(0xB0, uint(320)) + el(0xBA, uint(180))))
    tracks = el(0x1654AE6B, video)
    clu1 = el(0x1F43B675,
              el(0xE7, uint(1000)) +
              simple_block(b"\x81", 5, b"\x00\x01") +
              simple_block(b"\x81", 10, b"\x02\x03\x04"))
    # second cluster: UNKNOWN size, runs to EOF; 2-byte track varint
    # (0x4001 = track 1 in the wider form the reader must also strip)
    clu2_payload = (el(0xE7, uint(2000)) +
                    simple_block(b"\x40\x01", 34, b"\xde\xad\xbe\xef") +
                    block_group(b"\x81", 47, b"\x99\x88"))
    clu2 = ebml_id(0x1F43B675) + b"\x01" + b"\xff" * 7 + clu2_payload
    seg_payload = info + tracks + clu1 + clu2
    segment = ebml_id(0x18538067) + b"\x01" + b"\xff" * 7 + seg_payload
    with open(os.path.join(FIX, "sample_live.webm"), "wb") as f:
        f.write(header + segment)
    print("sample_live.webm: no Duration, clusters at 1000(+5,+10) and "
          "2000(+34 simple, +47 BlockGroup; unknown size) -> "
          "expect duration_ms 2047")


if __name__ == "__main__":
    main()
