#!/usr/bin/env python3
"""Generate sample.webm — an INDEPENDENT EBML/WebM builder pinning
WebmMeta's walk (hand-rolled per RFC 8794 + the Matroska registry, no
mkv lib): EBML header (DocType webm), Segment with the streaming-
muxer UNKNOWN size (all-ones varint), Info with TimestampScale
1000000 and a 4-BYTE-float Duration 2500.0 -> 2500 ms, a V_VP9
1280x720 video track + an A_OPUS 48000 Hz 2ch audio track (floats as
4-byte where the Scala builder writes 8), a SeekHead the walk must
skip, and a Cluster of junk bytes.
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


def main():
    header = el(0x1A45DFA3,
                el(0x4286, uint(1)) + el(0x42F7, uint(1)) +
                el(0x42F2, uint(4)) + el(0x42F3, uint(8)) +
                el(0x4282, b"webm") + el(0x4287, uint(4)) +
                el(0x4285, uint(2)))
    info = el(0x1549A966,
              el(0x2AD7B1, uint(1000000)) +
              el(0x4489, struct.pack(">f", 2500.0)))  # 4-byte float
    video = el(0xAE,
               el(0xD7, uint(1)) + el(0x73C5, uint(1)) +
               el(0x83, uint(1)) + el(0x86, b"V_VP9") +
               el(0xE0, el(0xB0, uint(1280)) + el(0xBA, uint(720))))
    audio = el(0xAE,
               el(0xD7, uint(2)) + el(0x73C5, uint(2)) +
               el(0x83, uint(2)) + el(0x86, b"A_OPUS") +
               el(0xE1, el(0xB5, struct.pack(">f", 48000.0)) +
                  el(0x9F, uint(2))))
    tracks = el(0x1654AE6B, video + audio)
    seekhead = el(0x114D9B74, el(0x4DBB, el(0x53AB, ebml_id(0x1549A966))))
    cluster = el(0x1F43B675, el(0xE7, uint(0)) + b"\xde\xad" * 40)
    seg_payload = seekhead + info + tracks + cluster
    # unknown segment size: 0x01 + 7x 0xFF
    segment = ebml_id(0x18538067) + b"\x01" + b"\xff" * 7 + seg_payload
    with open(os.path.join(FIX, "sample.webm"), "wb") as f:
        f.write(header + segment)
    print("sample.webm: unknown-size segment, 2500 ms, V_VP9 1280x720 "
          "+ A_OPUS 48k/2ch, SeekHead skipped")


if __name__ == "__main__":
    main()
