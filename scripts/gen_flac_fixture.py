#!/usr/bin/env python3
"""Generate tone.flac — a REAL FLAC stream from an INDEPENDENT encoder
(this script, not the Scala FlacCodec.encodeFlac path), pinning the
decoder bit-for-bit in FlacCodecSpec: mono 8-bit, 100 samples of a
deterministic ramp+step waveform, block size 48 (so three full frames
and a 4-sample tail exercise the short-last-frame path), FIXED order 2
subframes with single-partition Rice residuals, correct CRC-8/CRC-16.

Writes src/test/resources/graft/fixtures/tone.flac. Deterministic.
"""
import os

FIX = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "graft", "fixtures")

SAMPLES = [(7 * i) % 101 + (13 if i % 9 == 0 else 0) for i in range(100)]
RATE = 8000
BITS = 8
BLOCK = 48
ORDER = 2


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v, w):
        self.acc = (self.acc << w) | (v & ((1 << w) - 1))
        self.n += w
        while self.n >= 8:
            self.n -= 8
            self.bytes.append((self.acc >> self.n) & 0xFF)

    def align(self):
        if self.n:
            self.write(0, 8 - self.n)


def crc8(data):
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data):
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def utf8_num(w, v):
    assert v < 0x80  # 4 frames only
    w.write(v, 8)


def subframe_fixed(w, s, order):
    w.write(0, 1)          # padding
    w.write(8 + order, 6)  # FIXED(order)
    w.write(0, 1)          # no wasted bits
    for i in range(order):
        w.write(s[i] & ((1 << BITS) - 1), BITS)
    res = []
    for i in range(order, len(s)):
        if order == 0:
            p = 0
        elif order == 1:
            p = s[i - 1]
        else:
            p = 2 * s[i - 1] - s[i - 2]
        res.append(s[i] - p)
    zig = [(r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1 for r in res]
    best, best_bits = 0, None
    for p in range(15):
        bits = sum((z >> p) + 1 + p for z in zig)
        if best_bits is None or bits < best_bits:
            best, best_bits = p, bits
    w.write(0, 2)   # method 0
    w.write(0, 4)   # partition order 0
    w.write(best, 4)
    for z in zig:
        q = z >> best
        w.write(1, q + 1)  # q zero bits then a one — write(1, q+1) emits exactly that
        if best:
            w.write(z & ((1 << best) - 1), best)


def frame(idx, s):
    hdr = BitWriter()
    hdr.write(0x3FFE, 14)
    hdr.write(0, 1)
    hdr.write(0, 1)  # fixed blocksize stream
    hdr.write(6, 4)  # 8-bit blocksize at end
    hdr.write(0, 4)  # rate from STREAMINFO
    hdr.write(0, 4)  # 1 channel
    hdr.write(1, 3)  # 8-bit samples
    hdr.write(0, 1)
    utf8_num(hdr, idx)
    hdr.write(len(s) - 1, 8)
    hdr.align()
    head = bytes(hdr.bytes)
    body = BitWriter()
    subframe_fixed(body, s, min(ORDER, len(s) - 1))
    body.align()
    fb = head + bytes([crc8(head)]) + bytes(body.bytes)
    c = crc16(fb)
    return fb + bytes([c >> 8, c & 0xFF])


def main():
    out = bytearray(b"fLaC")
    si = BitWriter()
    si.write(0x80, 8)
    si.write(34, 24)
    si.write(BLOCK, 16)
    si.write(BLOCK, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(RATE, 20)
    si.write(0, 3)         # 1 channel
    si.write(BITS - 1, 5)
    si.write(len(SAMPLES), 36)
    for _ in range(16):
        si.write(0, 8)
    out += si.bytes
    for i in range(0, len(SAMPLES), BLOCK):
        out += frame(i // BLOCK, SAMPLES[i:i + BLOCK])
    with open(os.path.join(FIX, "tone.flac"), "wb") as f:
        f.write(out)
    n = len(SAMPLES)
    print("tone.flac:", len(out), "bytes; n_frames", n,
          "mean", sum(SAMPLES) / n, "min", min(SAMPLES), "max", max(SAMPLES),
          "duration_ms", n * 1000 // RATE)


if __name__ == "__main__":
    main()
