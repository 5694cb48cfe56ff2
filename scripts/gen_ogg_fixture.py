#!/usr/bin/env python3
"""Generate sample.ogg — an INDEPENDENT Ogg/Opus builder pinning
OggMeta's walk: BOS page with an OpusHead (2ch, pre_skip=312), an
OpusTags comment page (the decoder must not care), three audio pages —
one with a 600-byte body so the lacing table carries 255,255,90 —
terminal granule 48312 (EOS), so duration = (48312-312)*1000//48000
= 1000 ms exactly. Every page CRC'd with the unreflected Ogg CRC-32.
"""
import os
import struct

FIX = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "graft", "fixtures")


def crc(data):
    c = 0
    for b in data:
        c ^= b << 24
        for _ in range(8):
            c = ((c << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if c & 0x80000000 else (c << 1) & 0xFFFFFFFF
    return c


def page(seq, htype, granule, body, serial=0x11223344):
    lacing = bytes([255] * (len(body) // 255) + [len(body) % 255])
    hdr = b"OggS" + bytes([0, htype]) + struct.pack("<q", granule) + \
        struct.pack("<II", serial, seq) + b"\x00\x00\x00\x00" + \
        bytes([len(lacing)]) + lacing
    full = bytearray(hdr + body)
    c = crc(full)
    full[22:26] = struct.pack("<I", c)
    return bytes(full)


def main():
    opus_head = b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 312) + \
        struct.pack("<I", 48000) + b"\x00\x00" + bytes([0])
    opus_tags = b"OpusTags" + struct.pack("<I", 5) + b"graft" + struct.pack("<I", 0)
    # tags page carries granule -1 (no PCM position on a header page)
    out = page(0, 2, 0, opus_head) + page(1, 0, -1, opus_tags)
    out += page(2, 0, 16312, b"a" * 600)   # multi-lacing body
    out += page(3, 0, 32312, b"b" * 123)
    out += page(4, 4, 48312, b"c" * 40)    # EOS
    with open(os.path.join(FIX, "sample.ogg"), "wb") as f:
        f.write(out)
    print("sample.ogg: expect opus 2ch pre_skip=312 n_pages=5 "
          "last_granule=48312 duration_ms=1000")


if __name__ == "__main__":
    main()
