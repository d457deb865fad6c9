"""ctypes binding for the native BAM batch decoder (native/abam.cpp).

Exposes the same reader interface as io.bam.BamReader but decodes records in
batches through the C++ library; falls back transparently to the pure-Python
reader when the shared library is unavailable.  Auto-builds native/libabam.so
with g++ on first use (cached).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from .bam import BamHeader, BamRec

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libabam.so")

_LIB = None
_LIB_TRIED = False

BATCH = 4096
CIG_CAP = BATCH * 16
Q_CAP = BATCH * 64


def _load_lib():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    try:
        if not os.path.exists(_SO_PATH):
            subprocess.run(["make", "-s", "-C", _NATIVE_DIR],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_SO_PATH)
        lib.abam_open.restype = ctypes.c_void_p
        lib.abam_open.argtypes = [ctypes.c_char_p]
        lib.abam_close.argtypes = [ctypes.c_void_p]
        lib.abam_ntargets.argtypes = [ctypes.c_void_p]
        lib.abam_ntargets.restype = ctypes.c_int
        lib.abam_target_name.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                         ctypes.c_char_p, ctypes.c_int]
        lib.abam_target_name.restype = ctypes.c_int
        lib.abam_target_len.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.abam_target_len.restype = ctypes.c_int64
        lib.abam_tell.argtypes = [ctypes.c_void_p]
        lib.abam_tell.restype = ctypes.c_uint64
        lib.abam_seek.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.abam_seek.restype = ctypes.c_int
        lib.abam_read_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int64]
        lib.abam_read_batch.restype = ctypes.c_int
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def native_available():
    return _load_lib() is not None


class NativeBamReader:
    """Batch-decoding BAM reader with the BamReader interface."""

    def __init__(self, path):
        lib = _load_lib()
        if lib is None:
            raise OSError("native BAM library unavailable")
        self._lib = lib
        self._h = lib.abam_open(path.encode())
        if not self._h:
            raise IOError("cannot open BAM %s" % path)
        nt = lib.abam_ntargets(self._h)
        names = []
        lengths = []
        buf = ctypes.create_string_buffer(1024)
        for i in range(nt):
            lib.abam_target_name(self._h, i, buf, 1024)
            names.append(buf.value.decode())
            lengths.append(int(lib.abam_target_len(self._h, i)))
        self.header = BamHeader("", names, lengths)
        self._fixed = np.zeros((BATCH, 16), dtype=np.int32)
        self._voffs = np.zeros(BATCH, dtype=np.uint64)
        self._cigars = np.zeros(CIG_CAP, dtype=np.uint32)
        self._qnames = ctypes.create_string_buffer(Q_CAP)
        self._count = 0
        self._cursor = 0

    def close(self):
        if self._h:
            self._lib.abam_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()

    def _fill(self):
        lib = self._lib
        self._count = lib.abam_read_batch(
            self._h, BATCH,
            self._fixed.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._voffs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            self._cigars.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            CIG_CAP, self._qnames, Q_CAP)
        self._cursor = 0
        return self._count > 0

    def tell(self):
        if self._cursor < self._count:
            return int(self._voffs[self._cursor])
        return int(self._lib.abam_tell(self._h))

    def seek(self, voff):
        self._count = 0
        self._cursor = 0
        self._lib.abam_seek(self._h, voff)

    def read_rec(self):
        if self._cursor >= self._count:
            if not self._fill():
                return None
        f = self._fixed[self._cursor]
        rec = BamRec()
        rec.tid = int(f[0])
        rec.pos = int(f[1])
        rec.rpos = int(f[2])
        rec.mapq = int(f[3])
        rec.qual = rec.mapq
        rec.flag = int(f[4])
        rec.mtid = int(f[5])
        rec.mpos = int(f[6])
        rec.isize = int(f[7])
        n_cigar = int(f[8])
        coff = int(f[9])
        cig = self._cigars[coff:coff + n_cigar]
        rec.cigar = [(int(c) & 0xF, int(c) >> 4) for c in cig]
        qoff = int(f[10])
        qlen = int(f[11])
        rec.qname = self._qnames.raw[qoff:qoff + qlen].decode()
        rec.xs = chr(int(f[12]))
        rec.hi = int(f[13])
        rec.nh = int(f[14])
        rec.nm = int(f[15])
        rec.l_seq = 0
        self._cursor += 1
        return rec


def open_bam(path):
    """Best reader available: native if the library builds, else Python."""
    if native_available():
        return NativeBamReader(path)
    from .bam import BamReader
    return BamReader(path)
