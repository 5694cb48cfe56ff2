#!/usr/bin/env python3
"""Generate sample_gps.tif — an INDEPENDENT big-endian bare-TIFF GPS
fixture pinning ExifGps's r20 carrier (the Scala graft path appends a
rebuilt IFD at EOF; this file lays the GPS IFD out INLINE between the
raster and IFD0, a layout the reader must also accept): a 4x3 8-bit
gray single-strip raster, IFD0 with the baseline tags plus the
0x8825 GPS pointer, GPS IFD with the same coordinates as
sample_gps.jpg — lat 10d20m 15/2s -> 37207 arcsec (truncating den=2),
lon 99d0m 5/1s -> 356405 arcsec.
"""
import os
import struct

FIX = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "graft", "fixtures")


def entry(tag, tpe, cnt, val):
    return struct.pack(">HHII", tag, tpe, cnt, val)


def short_entry(tag, val):
    return struct.pack(">HHIHH", tag, 3, 1, val, 0)


def main():
    W, H = 4, 3
    raster = bytes((x * 17 + y * 40) % 256 for y in range(H) for x in range(W))
    data_start = 8
    gps_off = data_start + len(raster)
    lat_off = gps_off + 2 + 4 * 12 + 4
    lon_off = lat_off + 24
    ifd0_off = lon_off + 24

    gps = struct.pack(">H", 4)
    gps += struct.pack(">HHI4s", 1, 2, 2, b"N\x00\x00\x00")
    gps += entry(2, 5, 3, lat_off)
    gps += struct.pack(">HHI4s", 3, 2, 2, b"W\x00\x00\x00")
    gps += entry(4, 5, 3, lon_off)
    gps += struct.pack(">I", 0)
    lat = struct.pack(">6I", 10, 1, 20, 1, 15, 2)
    lon = struct.pack(">6I", 99, 1, 0, 1, 5, 1)

    entries = [
        entry(256, 4, 1, W),
        entry(257, 4, 1, H),
        short_entry(258, 8),
        short_entry(259, 1),
        short_entry(262, 1),
        entry(273, 4, 1, data_start),
        short_entry(277, 1),
        entry(278, 4, 1, H),
        entry(279, 4, 1, len(raster)),
        entry(0x8825, 4, 1, gps_off),
    ]
    ifd0 = struct.pack(">H", len(entries)) + b"".join(entries) + struct.pack(">I", 0)

    out = (b"MM\x00\x2a" + struct.pack(">I", ifd0_off)
           + raster + gps + lat + lon + ifd0)
    with open(os.path.join(FIX, "sample_gps.tif"), "wb") as f:
        f.write(out)
    print("sample_gps.tif: MM-order bare TIFF, N 37207 / W 356405 arcsec, "
          f"{W}x{H} gray raster")


if __name__ == "__main__":
    main()
