#!/usr/bin/env python3
"""Generate sample.mp3 — an INDEPENDENT MP3 builder pinning Mp3Meta's
walk against a second implementation: ID3v2.4 tag (syncsafe frame
sizes) with a UTF-16 BOM'd TIT2 and a UTF-8 TPE1, then 5 MPEG1
Layer III frames at 128 kbps / 44100 Hz stereo with the PADDING BIT
SET on frames 1 and 3 (frame length 417+1 vs 417), a 6th frame at
160 kbps (so vbr=True), and an ID3v1 "TAG" trailer.

Expected decode: bitrate_kbps=128 (first frame), rate=44100,
channels=2, n_frames=6, duration_ms=6*1152*1000//44100=156, vbr=True,
title='Pinned Title', artist='pinned artist'.
"""
import os

FIX = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "graft", "fixtures")


def syncsafe(n):
    return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F])


def text_frame(fid, payload):
    return fid.encode() + syncsafe(len(payload)) + b"\x00\x00" + payload


def frame(bitrate_idx, rate_idx, pad, stereo, fill):
    bitrates = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
    rates = [44100, 48000, 32000]
    n = 144000 * bitrates[bitrate_idx] // rates[rate_idx] + pad
    hdr = bytes([0xFF, 0xFB, (bitrate_idx << 4) | (rate_idx << 2) | (pad << 1),
                 0x00 if stereo else 0xC0])
    body = (fill * (n // len(fill) + 1))[:n - 4]
    return hdr + body


def main():
    tit2 = text_frame("TIT2", b"\x01\xff\xfe" + "Pinned Title".encode("utf-16-le"))
    tpe1 = text_frame("TPE1", b"\x03" + "pinned artist".encode("utf-8"))
    body = tit2 + tpe1
    tag = b"ID3\x04\x00\x00" + syncsafe(len(body)) + body
    frames = b"".join([
        frame(9, 0, 0, True, b"abc"),   # 128 kbps
        frame(9, 0, 1, True, b"def"),   # padded
        frame(9, 0, 0, True, b"ghi"),
        frame(9, 0, 1, True, b"jkl"),   # padded
        frame(9, 0, 0, True, b"mno"),
        frame(10, 0, 0, True, b"pqr"),  # 160 kbps -> vbr
    ])
    id3v1 = b"TAG" + b"\x00" * 125
    with open(os.path.join(FIX, "sample.mp3"), "wb") as f:
        f.write(tag + frames + id3v1)
    print("sample.mp3 written")



def unsync(body):
    """ID3v2.3 whole-tag unsynchronisation: insert 0x00 after every
    0xFF that precedes 0x00 or a 111xxxxx byte."""
    out = bytearray()
    for i, b in enumerate(body):
        out.append(b)
        if b == 0xFF and i + 1 < len(body) and (
                body[i + 1] == 0 or (body[i + 1] & 0xE0) == 0xE0):
            out.append(0)
    return bytes(out)


def v23_text_frame(fid, payload):
    n = len(payload)
    return (fid.encode() + bytes([(n >> 24) & 0xFF, (n >> 16) & 0xFF,
                                  (n >> 8) & 0xFF, n & 0xFF])
            + b"\x00\x00" + payload)


def main_unsync():
    # sample_unsync.mp3 (r20): a v2.3 tag whose title carries literal
    # 0xFF bytes ("y\xffy" in ISO-8859-1) AND a UTF-16 artist would —
    # keep it ISO so the ONLY FF bytes are the deliberate ones; the
    # whole tag is then unsynchronised (flag 0x80) with real escapes.
    tit2 = v23_text_frame("TIT2", b"\x00y\xff\xe5y")
    tpe1 = v23_text_frame("TPE1", b"\x00unsync artist")
    body = unsync(tit2 + tpe1)
    assert b"\xff\x00" in body, "fixture must carry a real escape"
    tag = b"ID3\x03\x00\x80" + syncsafe(len(body)) + body
    frames = b"".join([
        frame(9, 0, 0, False, b"abc"),
        frame(9, 0, 0, False, b"def"),
    ])
    with open(os.path.join(FIX, "sample_unsync.mp3"), "wb") as f:
        f.write(tag + frames)
    print("sample_unsync.mp3: title y\\xff\\xe5y artist 'unsync artist', "
          "2 mono frames, real FF 00 escapes in the tag")



def v22_text_frame(fid, payload):
    n = len(payload)
    return (fid.encode()
            + bytes([(n >> 16) & 0xFF, (n >> 8) & 0xFF, n & 0xFF])
            + payload)


def main_v22():
    # sample_v22.mp3 (r20): the pre-1999 ID3v2.2 layout — 6-byte frame
    # headers, 3-char IDs (TT2/TP1), 3-byte sizes — with a UTF-16
    # BOM'd title (encoding byte 1 existed in v2.2 too) and an
    # ISO-8859-1 artist, then 3 stereo frames.
    tt2 = v22_text_frame("TT2", b"\x01\xff\xfe"
                         + "Old Title".encode("utf-16-le"))
    tp1 = v22_text_frame("TP1", b"\x00v22 artist")
    body = tt2 + tp1
    tag = b"ID3\x02\x00\x00" + syncsafe(len(body)) + body
    frames = b"".join([
        frame(9, 1, 0, True, b"one"),
        frame(9, 1, 1, True, b"two"),
        frame(9, 1, 0, True, b"tri"),
    ])
    with open(os.path.join(FIX, "sample_v22.mp3"), "wb") as f:
        f.write(tag + frames)
    print("sample_v22.mp3: ID3v2.2 TT2 'Old Title' / TP1 'v22 artist', "
          "3 stereo frames at 48 kHz")


if __name__ == "__main__":
    main()
    main_unsync()
    main_v22()
