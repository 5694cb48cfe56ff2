#!/usr/bin/env python3
"""Generate sample_frag.mp4 — an INDEPENDENT fragmented ISO-BMFF
builder pinning Mp4Meta's moof/traf walk (hand-rolled boxes, no
ffmpeg/mp4 lib): an init segment (ftyp + moov with mvhd duration 0,
mdhd media timescale 90000, mvex/trex default_sample_duration 3000)
followed by THREE moof/mdat fragments covering every duration source:
  frag 1: trun with PER-SAMPLE durations (flag 0x100): 3000+2990+3010
  frag 2: tfhd default-sample-duration 1500 (flag 0x08), trun count 6
  frag 3: no tfhd default -> trex's 3000 applies, trun count 3
Total ticks = 9000 + 9000 + 9000 = 27000 at timescale 90000
-> duration_ms = 300.  Also sample_frag_mehd.mp4: same fragments plus
mvex/mehd fragment_duration 45000 (movie timescale 90000) which WINS
-> duration_ms = 500.
"""
import os
import struct

FIX = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "graft", "fixtures")


def box(typ, payload):
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def full(ver, flags):
    return bytes([ver]) + flags.to_bytes(3, "big")


def mvhd_v0(timescale, duration):
    p = full(0, 0)
    p += struct.pack(">IIII", 1, 2, timescale, duration)
    p += struct.pack(">i", 0x00010000) + struct.pack(">hh", 0x0100, 0)
    p += b"\x00" * 8
    p += struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    p += b"\x00" * 24
    p += struct.pack(">I", 2)
    return box(b"mvhd", p)


def tkhd_v0(track_id, w, h):
    p = full(0, 7)
    p += struct.pack(">IIIII", 1, 2, track_id, 0, 0)
    p += b"\x00" * 8
    p += struct.pack(">hhhh", 0, 0, 0, 0)
    p += struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    p += struct.pack(">II", w << 16, h << 16)
    return box(b"tkhd", p)


def mdhd_v0(timescale):
    return box(b"mdhd", full(0, 0)
               + struct.pack(">IIII", 1, 2, timescale, 0)
               + struct.pack(">HH", 0x55C4, 0))  # language 'und'


def hdlr(handler):
    return box(b"hdlr", full(0, 0) + b"\x00" * 4 + handler
               + b"\x00" * 12 + b"graft\x00")


def stsd(codec):
    entry = box(codec, b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 8)
    return box(b"stsd", full(0, 0) + struct.pack(">I", 1) + entry)


def trak(track_id, w, h, handler, codec, media_timescale):
    stbl = box(b"stbl", stsd(codec))
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd_v0(media_timescale) + hdlr(handler) + minf)
    return box(b"trak", tkhd_v0(track_id, w, h) + mdia)


def trex(track_id, default_dur):
    return box(b"trex", full(0, 0)
               + struct.pack(">IIIII", track_id, 1, default_dur, 0, 0))


def mehd(frag_dur):
    return box(b"mehd", full(0, 0) + struct.pack(">I", frag_dur))


def moof(seq, track_id, tfhd_default, per_sample_durs, count):
    mfhd = box(b"mfhd", full(0, 0) + struct.pack(">I", seq))
    tf_flags = 0x020000 | (0x08 if tfhd_default is not None else 0)
    tf = full(0, tf_flags) + struct.pack(">I", track_id)
    if tfhd_default is not None:
        tf += struct.pack(">I", tfhd_default)
    tfhd = box(b"tfhd", tf)
    if per_sample_durs is not None:
        tr = full(0, 0x100) + struct.pack(">I", len(per_sample_durs))
        for d in per_sample_durs:
            tr += struct.pack(">I", d)
    else:
        tr = full(0, 0) + struct.pack(">I", count)
    trun = box(b"trun", tr)
    return box(b"moof", mfhd + box(b"traf", tfhd + trun))


def build(with_mehd):
    ftyp = box(b"ftyp", b"iso6" + struct.pack(">I", 1) + b"iso6dash")
    mvex_kids = (mehd(45000) if with_mehd else b"") + trex(1, 3000)
    moov = box(b"moov", mvhd_v0(90000, 0)
               + trak(1, 640, 360, b"vide", b"avc1", 90000)
               + box(b"mvex", mvex_kids))
    frags = (moof(1, 1, None, [3000, 2990, 3010], None) + box(b"mdat", b"a" * 30)
             + moof(2, 1, 1500, None, 6) + box(b"mdat", b"b" * 20)
             + moof(3, 1, None, None, 3) + box(b"mdat", b"c" * 10))
    return ftyp + moov + frags


def sidx(timescale, durations):
    p = full(0, 0) + struct.pack(">III", 1, timescale, 0) + struct.pack(">I", 0)
    p += struct.pack(">HH", 0, len(durations))
    for d in durations:
        p += struct.pack(">III", 0, d, 0)
    return box(b"sidx", p)


def build_segment():
    styp = box(b"styp", b"msdh" + struct.pack(">I", 0) + b"msdhmsix")
    # two references summing 120000 ticks @ 48000 -> 2500 ms
    idx = sidx(48000, [72000, 48000])
    frags = (moof(1, 1, 1500, None, 48) + box(b"mdat", b"s" * 16)
             + moof(2, 1, None, [24000, 24000], None) + box(b"mdat", b"t" * 8))
    return styp + idx + frags


def main():
    with open(os.path.join(FIX, "sample_frag.mp4"), "wb") as f:
        f.write(build(False))
    print("sample_frag.mp4: expect fragmented=true n_fragments=3 "
          "duration_ms=300 (27000 ticks @ 90000)")
    with open(os.path.join(FIX, "sample_frag_mehd.mp4"), "wb") as f:
        f.write(build(True))
    print("sample_frag_mehd.mp4: mehd 45000 wins -> duration_ms=500")
    with open(os.path.join(FIX, "sample_segment.m4s"), "wb") as f:
        f.write(build_segment())
    print("sample_segment.m4s: moov-less styp+sidx segment -> brand=msdh "
          "timescale=48000 duration_ms=2500 n_fragments=2 n_tracks=0")


if __name__ == "__main__":
    main()
