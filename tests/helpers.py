"""Shared test helpers: synthesize BAM records / bundles."""

from aletsch_tpu.config import Parameters
from aletsch_tpu.constants import PAIRED_END
from aletsch_tpu.core.bundle import BundleBase
from aletsch_tpu.core.hits import Hit
from aletsch_tpu.io.bam import BamRec, parse_cigar


def make_rec(qname, pos, cigar, flag=0, tid=0, mpos=-1, mtid=-1, isize=0,
             xs=".", mapq=60, nh=1):
    rec = BamRec()
    rec.qname = qname
    rec.tid = tid
    rec.pos = pos
    rec.cigar = parse_cigar(cigar) if isinstance(cigar, str) else cigar
    rec.rpos = pos + rec.ref_len()
    rec.flag = flag
    rec.mpos = mpos
    rec.mtid = mtid
    rec.isize = isize
    rec.xs = xs
    rec.mapq = mapq
    rec.qual = mapq
    rec.nh = nh
    return rec


def make_pair_recs(qname, pos1, cigar1, pos2, cigar2, xs="."):
    """A proper pair; isize = outer span."""
    r1 = make_rec(qname, pos1, cigar1, flag=0x1 | 0x40 | 0x20, xs=xs)
    r2 = make_rec(qname, pos2, cigar2, flag=0x1 | 0x80 | 0x10, xs=xs)
    span = (r2.pos + r2.ref_len()) - r1.pos
    r1.mpos = r2.pos
    r1.isize = span
    r2.mpos = r1.pos
    r2.isize = -span
    return r1, r2


def build_bundle(recs, strand="+", chrm="chr1"):
    """Feed records pos-sorted into a BundleBase like the generator does."""
    bb = BundleBase()
    bb.chrm = chrm
    recs = sorted(recs, key=lambda r: (r.pos, r.rpos, r.qname))
    for hid, rec in enumerate(recs):
        ht = Hit(rec, hid)
        ht.strand = strand
        bb.add_hit_intervals(ht, rec)
    bb.strand = strand
    bb.splices = bb.hcst.get_splices()
    return bb


def two_exon_recs(n_spliced=10, n_exon=8, with_pairs=False):
    """Records over a two-exon gene: exons [1000,1100) and [1300,1400)."""
    recs = []
    for i in range(n_spliced):
        # all share junction (1100, 1300); staggered starts avoid dedup
        recs.append(make_rec("s%d" % i, 1050 - i, "%dM200N50M" % (50 + i),
                             xs="+"))
    for i in range(n_exon):
        recs.append(make_rec("e%d" % i, 1000 + 2 * i, "60M", xs="."))
        recs.append(make_rec("f%d" % i, 1300 + 2 * i, "60M", xs="."))
    if with_pairs:
        for i in range(6):
            # odd start positions avoid pos/rpos dedup against e/f reads
            r1, r2 = make_pair_recs("p%d" % i, 1001 + 4 * i, "60M",
                                    1321 + 4 * i, "60M")
            recs.extend([r1, r2])
    return recs


def default_cfg():
    p = Parameters()
    p.set_default(PAIRED_END)
    return p
