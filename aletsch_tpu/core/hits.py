"""Alignment hits: strand assignment and fragment pairing keys.

A Hit is the assembler-facing slice of a BAM record (rnacore/hit.{h,cc}):
coordinates, flags, XS/HI/NH/NM tags, library-type-derived strand.
"""

from __future__ import annotations

from zlib import crc32

from ..constants import FR_FIRST, FR_SECOND
from ..io.bam import FPAIRED, FREAD1, FREAD2, FREVERSE


class Hit:
    __slots__ = ("hid", "tid", "pos", "rpos", "mpos", "mtid", "isize", "flag",
                 "qual", "qname", "strand", "xs", "ts", "hi", "nh", "nm",
                 "_qhash")

    def __init__(self, rec=None, hid=0):
        self.hid = hid
        self.strand = "."
        self._qhash = None
        if rec is None:
            return
        self.tid = rec.tid
        self.pos = rec.pos
        self.rpos = rec.rpos
        self.mpos = rec.mpos
        self.mtid = rec.mtid
        self.isize = rec.isize
        self.flag = rec.flag
        self.qual = rec.mapq
        self.qname = rec.qname
        self.xs = rec.xs
        self.ts = rec.ts
        self.hi = rec.hi
        self.nh = rec.nh
        self.nm = rec.nm

    def set_strand(self, libtype):
        """Library-type strand inference (rnacore/hit.cc:152-185)."""
        self.strand = "."
        f = self.flag
        paired = (f & FPAIRED) >= 1
        rev = (f & FREVERSE) >= 1
        r1 = (f & FREAD1) >= 1
        r2 = (f & FREAD2) >= 1
        if libtype == FR_FIRST and paired:
            if not rev and r1 and not r2:
                self.strand = "-"
            if rev and r1 and not r2:
                self.strand = "+"
            if not rev and not r1 and r2:
                self.strand = "+"
            if rev and not r1 and r2:
                self.strand = "-"
        if libtype == FR_SECOND and paired:
            if not rev and r1 and not r2:
                self.strand = "+"
            if rev and r1 and not r2:
                self.strand = "-"
            if not rev and not r1 and r2:
                self.strand = "-"
            if rev and not r1 and r2:
                self.strand = "+"
        if libtype == FR_FIRST and not paired:
            self.strand = "+" if rev else "-"
        if libtype == FR_SECOND and not paired:
            self.strand = "-" if rev else "+"

    def get_qhash(self):
        """Deterministic qname hash for mate-pair bucketing (hit.cc:217-220).

        crc32 is C-speed and process-stable; only intra-bundle consistency
        matters for pairing correctness."""
        h = self._qhash
        if h is None:
            h = crc32(self.qname.encode())
            self._qhash = h
        return h

    def __repr__(self):
        return "Hit(%s %d-%d %s)" % (self.qname, self.pos, self.rpos, self.strand)
