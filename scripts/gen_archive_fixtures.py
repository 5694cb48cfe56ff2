#!/usr/bin/env python3
"""Generate archive fixtures for ArchiveSpec from INDEPENDENT writers
(python's stdlib zipfile/tarfile — not the Scala encoders), so the
readers in sources/Archive.scala are pinned against a second
implementation, the gen_image_fixtures.py discipline.

sample.zip: three regular files (stored + two deflated, one in a
subdirectory behind an explicit directory entry) plus an archive
comment, so EOCD discovery must scan backwards.
sample.tar: two regular files and a directory entry, POSIX ustar.

Writes into src/test/resources/graft/fixtures/. Deterministic: fixed
mtimes, no OS metadata.
"""
import io
import os
import tarfile
import zipfile

FIX = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "graft", "fixtures")

ALPHA = ("the quick brown fox jumps over the lazy dog " * 8).encode()
BETA = b"row " * 100  # highly compressible
GAMMA = bytes(range(32, 127)) * 3  # printable ASCII sweep


def gen_zip():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        zi = zipfile.ZipInfo("alpha.txt", date_time=(1980, 1, 1, 0, 0, 0))
        z.writestr(zi, ALPHA, compress_type=zipfile.ZIP_DEFLATED)
        zi = zipfile.ZipInfo("stored.txt", date_time=(1980, 1, 1, 0, 0, 0))
        z.writestr(zi, GAMMA, compress_type=zipfile.ZIP_STORED)
        zi = zipfile.ZipInfo("sub/", date_time=(1980, 1, 1, 0, 0, 0))
        zi.external_attr = 0o40755 << 16
        z.writestr(zi, b"")
        zi = zipfile.ZipInfo("sub/beta.txt", date_time=(1980, 1, 1, 0, 0, 0))
        z.writestr(zi, BETA, compress_type=zipfile.ZIP_DEFLATED)
        z.comment = b"fixture archive: EOCD is NOT at a fixed offset"
    with open(os.path.join(FIX, "sample.zip"), "wb") as f:
        f.write(buf.getvalue())


def gen_tar():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as t:
        ti = tarfile.TarInfo("alpha.txt")
        ti.size = len(ALPHA)
        ti.mtime = 0
        t.addfile(ti, io.BytesIO(ALPHA))
        ti = tarfile.TarInfo("sub")
        ti.type = tarfile.DIRTYPE
        ti.mtime = 0
        t.addfile(ti)
        ti = tarfile.TarInfo("sub/gamma.bin")
        ti.size = len(GAMMA)
        ti.mtime = 0
        t.addfile(ti, io.BytesIO(GAMMA))
    with open(os.path.join(FIX, "sample.tar"), "wb") as f:
        f.write(buf.getvalue())


if __name__ == "__main__":
    gen_zip()
    gen_tar()
    print("wrote sample.zip, sample.tar")


def gen_longname_tar():
    """GNU long-name fixture (r19): a >100-char path stored through an
    'L' record, followed by a short-named entry — the reader must
    apply the long name to the first entry only."""
    import io
    buf = io.BytesIO()
    long_name = "deeply/" + ("n" * 120) + "/payload_with_a_very_long_gnu_path.txt"
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.GNU_FORMAT) as tf:
        data = b"long-name payload body"
        ti = tarfile.TarInfo(long_name)
        ti.size = len(data)
        ti.mtime = 0
        tf.addfile(ti, io.BytesIO(data))
        data2 = b"short name after"
        ti2 = tarfile.TarInfo("short.txt")
        ti2.size = len(data2)
        ti2.mtime = 0
        tf.addfile(ti2, io.BytesIO(data2))
    with open(os.path.join(FIX, "sample_longname.tar"), "wb") as f:
        f.write(buf.getvalue())
    print("sample_longname.tar: GNU L record + short entry")


gen_longname_tar()
