#!/usr/bin/env python3
"""Generate sample_gps.jpg — an INDEPENDENT big-endian (MM) Exif GPS
fixture pinning operators/ExifGps.scala (the Scala builder writes
little-endian only): SOI + APP1 whose IFD0 carries orientation 6 and
a GPS IFD pointer (0x8825), GPS IFD with N/W refs and D-M-S rationals
including a den=2 seconds term exercising the truncating division —
lat 10d20m 15/2s -> 10*3600+20*60+7 = 37207 arcsec, lon 99d0m 5/1s ->
356405 arcsec — then EOI.
"""
import os
import struct

FIX = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "graft", "fixtures")


def entry(tag, tpe, cnt, val):
    return struct.pack(">HHII", tag, tpe, cnt, val)


def main():
    # TIFF (big-endian), IFD0 at 8 with 2 entries
    ifd0 = struct.pack(">H", 2)
    # orientation: SHORT inline — BE u16 in the FIRST two value bytes
    ifd0 += struct.pack(">HHIHH", 0x0112, 3, 1, 6, 0)
    gps_off = 8 + 2 + 2 * 12 + 4  # after IFD0 + next-ptr
    ifd0 += entry(0x8825, 4, 1, gps_off)
    ifd0 += struct.pack(">I", 0)

    lat_off = gps_off + 2 + 4 * 12 + 4
    lon_off = lat_off + 24
    gps = struct.pack(">H", 4)
    gps += struct.pack(">HHI4s", 1, 2, 2, b"N\x00\x00\x00")  # GPSLatitudeRef
    gps += entry(2, 5, 3, lat_off)                           # GPSLatitude
    gps += struct.pack(">HHI4s", 3, 2, 2, b"W\x00\x00\x00")  # GPSLongitudeRef
    gps += entry(4, 5, 3, lon_off)                           # GPSLongitude
    gps += struct.pack(">I", 0)
    lat = struct.pack(">6I", 10, 1, 20, 1, 15, 2)  # 10d 20m 7.5s -> trunc 37207
    lon = struct.pack(">6I", 99, 1, 0, 1, 5, 1)    # 99d 0m 5s  -> 356405

    tiff = b"MM\x00\x2a" + struct.pack(">I", 8) + ifd0 + gps + lat + lon
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    out = b"\xff\xd8" + app1 + b"\xff\xd9"
    with open(os.path.join(FIX, "sample_gps.jpg"), "wb") as f:
        f.write(out)
    print("sample_gps.jpg: MM-order, ori 6, N 37207 / W 356405 arcsec")


if __name__ == "__main__":
    main()
