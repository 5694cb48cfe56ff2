#!/usr/bin/env python3
"""Generate sample.mp4 — an INDEPENDENT ISO-BMFF builder pinning
Mp4Meta's box walk (hand-rolled boxes, no ffmpeg/mp4 lib): spec-exact
ftyp + moov with a v1 mvhd (timescale 90000, duration 270000 ->
3000 ms), a v0-tkhd avc1 video track at 640x360 (16.16 fixed widths),
a v1-tkhd mp4a audio track, a free box the walk must skip whole, and
a trailing mdat. Also sample_sz0.mp4 exercising the size-0
"to end of file" final box.
"""
import os
import struct

FIX = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "graft", "fixtures")


def box(typ, payload):
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def full(ver, flags):
    return bytes([ver]) + flags.to_bytes(3, "big")


def mvhd_v1(timescale, duration):
    p = full(1, 0)
    p += struct.pack(">QQIQ", 1, 2, timescale, duration)  # times, scale, dur
    p += struct.pack(">i", 0x00010000) + struct.pack(">hh", 0x0100, 0)  # rate, volume, reserved
    p += b"\x00" * 8  # reserved
    p += struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)  # matrix
    p += b"\x00" * 24  # pre_defined
    p += struct.pack(">I", 3)  # next_track_ID
    return box(b"mvhd", p)


def tkhd(ver, track_id, duration, w, h):
    p = full(ver, 7)
    if ver == 1:
        p += struct.pack(">QQIIQ", 1, 2, track_id, 0, duration)
    else:
        p += struct.pack(">IIIII", 1, 2, track_id, 0, duration)
    p += b"\x00" * 8  # reserved
    p += struct.pack(">hhhh", 0, 0, 0x0100, 0)  # layer, alt_group, volume, reserved
    p += struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    p += struct.pack(">II", w << 16, h << 16)  # 16.16 fixed
    return box(b"tkhd", p)


def hdlr(handler):
    return box(b"hdlr", full(0, 0) + b"\x00" * 4 + handler + b"\x00" * 12 + b"graft\x00")


def stsd(codec):
    entry = box(codec, b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 8)
    return box(b"stsd", full(0, 0) + struct.pack(">I", 1) + entry)


def trak(ver, track_id, duration, w, h, handler, codec):
    stbl = box(b"stbl", stsd(codec))
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", hdlr(handler) + minf)
    return box(b"trak", tkhd(ver, track_id, duration, w, h) + mdia)


def main():
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    moov = box(b"moov", mvhd_v1(90000, 270000)
               + trak(0, 1, 270000, 640, 360, b"vide", b"avc1")
               + trak(1, 2, 270000, 0, 0, b"soun", b"mp4a"))
    free = box(b"free", b"skip me entirely")
    mdat = box(b"mdat", b"x" * 100)
    with open(os.path.join(FIX, "sample.mp4"), "wb") as f:
        f.write(ftyp + moov + free + mdat)
    print("sample.mp4: expect brand=isom minor=512 timescale=90000 "
          "duration_ms=3000 n_tracks=2 640x360 avc1/mp4a")

    # size-0 final box: mdat runs to EOF
    mdat0 = struct.pack(">I", 0) + b"mdat" + b"y" * 33
    with open(os.path.join(FIX, "sample_sz0.mp4"), "wb") as f:
        f.write(ftyp + moov + mdat0)
    print("sample_sz0.mp4: same stats, size-0 trailing mdat")


if __name__ == "__main__":
    main()
