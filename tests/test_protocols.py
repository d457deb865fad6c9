"""Protocol coverage: long reads (ONT/PacBio-style), single-end, chromosome
filters, multi-chromosome runs."""

import os
import random

from aletsch_tpu.config import default_params
from aletsch_tpu.constants import ONT
from aletsch_tpu.io.gtf import read_gtf
from aletsch_tpu.meta.incubator import Incubator
from aletsch_tpu.sim import map_to_genome, write_bam

ISO_X = [(10000, 10300), (15000, 15200), (20000, 20400)]   # chr1 '+'
ISO_Y = [(50000, 50500), (60000, 60600)]                    # chr2 '-'


def long_read_recs(exons, n, strand, rng, prefix):
    """Full-length single-end long reads covering the whole isoform."""
    total = sum(b - a for a, b in exons)
    recs = []
    for i in range(n):
        trim_l = rng.randint(0, 20)
        trim_r = rng.randint(0, 20)
        length = total - trim_l - trim_r
        g, cigar = map_to_genome(exons, trim_l, length)
        flag = 0x10 if strand == "-" else 0
        recs.append(dict(qname="%s.%d" % (prefix, i), flag=flag, pos=g,
                         cigar=cigar, mpos=-1, isize=0, xs=strand))
    return recs


def write_ont_sample(path, seed):
    rng = random.Random(seed)
    recs = long_read_recs(ISO_X, 12, "+", rng, "x")
    recs2 = long_read_recs(ISO_Y, 12, "-", rng, "y")
    write_bam(path, recs, names=("chr1", "chr2"), lengths=(10**6, 10**6))
    # chr2 records go in the same file
    allrecs = recs + [dict(r, tid=1, mtid=1) for r in recs2]
    write_bam(path, allrecs, names=("chr1", "chr2"), lengths=(10**6, 10**6))


def run(tmp_path, protocol, chrm_filter=""):
    bam = str(tmp_path / "ont.bam")
    write_ont_sample(bam, 5)
    bl = tmp_path / "bams.list"
    bl.write_text("%s %s.bai %s\n" % (bam, bam, protocol))
    out_gtf = str(tmp_path / "meta.gtf")
    out_dir = str(tmp_path / "gtf")
    os.makedirs(out_dir, exist_ok=True)
    params = default_params()
    for p in params:
        p.input_bam_list = str(bl)
        p.output_gtf_file = out_gtf
        p.output_gtf_dir = out_dir
        p.chrm_list_string = chrm_filter
        p.verbose = 0
    inc = Incubator(params)
    inc.resolve()
    return read_gtf(out_gtf)


def intron_chain(exons):
    return tuple((exons[k - 1][1], exons[k][0]) for k in range(1, len(exons)))


def test_ont_long_reads(tmp_path):
    trsts = run(tmp_path, "ont")
    chains = {(t.seqname, intron_chain(t.exons)) for t in trsts}
    assert ("chr1", intron_chain(ISO_X)) in chains
    assert ("chr2", intron_chain(ISO_Y)) in chains
    by = {t.seqname: t for t in trsts}
    assert by["chr1"].strand == "+"
    assert by["chr2"].strand == "-"


def test_pacbio_ccs(tmp_path):
    trsts = run(tmp_path, "pacbio_ccs")
    assert len(trsts) >= 2


def test_chromosome_filter(tmp_path):
    trsts = run(tmp_path, "ont", chrm_filter="chr2")
    assert len(trsts) >= 1
    assert all(t.seqname == "chr2" for t in trsts)


def test_pacbio_sub(tmp_path):
    trsts = run(tmp_path, "pacbio_sub")
    assert len(trsts) >= 2


def test_single_end(tmp_path):
    """single_end short reads: unpaired records, strand from XS only."""
    rng = random.Random(9)
    recs = []
    total = sum(b - a for a, b in ISO_X)
    for i in range(120):
        L = 100
        s = rng.randint(0, total - L)
        g, cigar = map_to_genome(ISO_X, s, L)
        from aletsch_tpu.io.bam import CREF_SKIP
        xs = "+" if any(op == CREF_SKIP for op, _ in cigar) else "."
        flag = 0x10 if rng.random() < 0.5 else 0
        recs.append(dict(qname="s.%d" % i, flag=flag, pos=g, cigar=cigar,
                         mpos=-1, isize=0, xs=xs))
    bam = str(tmp_path / "se.bam")
    write_bam(bam, recs, names=("chr1",), lengths=(10**6,))
    bl = tmp_path / "bams.list"
    bl.write_text("%s x single_end\n" % bam)
    out_gtf = str(tmp_path / "meta.gtf")
    out_dir = str(tmp_path / "gtf")
    os.makedirs(out_dir, exist_ok=True)
    params = default_params()
    for p in params:
        p.input_bam_list = str(bl)
        p.output_gtf_file = out_gtf
        p.output_gtf_dir = out_dir
        p.verbose = 0
    Incubator(params).resolve()
    trsts = read_gtf(out_gtf)
    chains = {intron_chain(t.exons) for t in trsts}
    assert intron_chain(ISO_X) in chains


def test_mixed_cohort(tmp_path):
    """paired_end and ont samples in one list: per-sample protocol overlays
    (incubator.cc reads a data type per line)."""
    from aletsch_tpu.sim import simulate_sample
    pe = str(tmp_path / "pe.bam")
    simulate_sample(pe, seed=3, names=("chr1", "chr2"),
                    lengths=(10**6, 10**6))
    lr = str(tmp_path / "lr.bam")
    write_ont_sample(lr, 7)
    bl = tmp_path / "bams.list"
    bl.write_text("%s x paired_end\n%s x ont\n" % (pe, lr))
    out_gtf = str(tmp_path / "meta.gtf")
    out_dir = str(tmp_path / "gtf")
    os.makedirs(out_dir, exist_ok=True)
    params = default_params()
    for p in params:
        p.input_bam_list = str(bl)
        p.output_gtf_file = out_gtf
        p.output_gtf_dir = out_dir
        p.verbose = 0
    inc = Incubator(params)
    inc.resolve()
    assert inc.samples[0].data_type != inc.samples[1].data_type
    trsts = read_gtf(out_gtf)
    chains = {(t.seqname, intron_chain(t.exons)) for t in trsts}
    # ISO_X is supported by both samples; count2 should reflect both
    assert ("chr1", intron_chain(ISO_X)) in chains
    assert ("chr2", intron_chain(ISO_Y)) in chains


def test_long_reads_beyond_max_read_span(tmp_path):
    """Unpaired reads past coordinate max_read_span (~500 kb) must survive:
    the reference's mate-span filter (generator.cc:95) silently drops them
    (mpos=-1, 0x8 unset without 0x1) — documented divergence."""
    iso = [(700000, 700400), (705000, 705300), (710000, 710500)]
    rng = random.Random(13)
    recs = long_read_recs(iso, 15, "+", rng, "far")
    bam = str(tmp_path / "far.bam")
    write_bam(bam, recs, names=("chr1",), lengths=(2 * 10**6,))
    bl = tmp_path / "bams.list"
    bl.write_text("%s x ont\n" % bam)
    out_gtf = str(tmp_path / "meta.gtf")
    params = default_params()
    out_dir = str(tmp_path / "gtf")
    os.makedirs(out_dir)
    for p in params:
        p.input_bam_list = str(bl)
        p.output_gtf_file = out_gtf
        p.output_gtf_dir = out_dir
        p.verbose = 0
    Incubator(params).resolve()
    trsts = read_gtf(out_gtf)
    assert intron_chain(iso) in {intron_chain(t.exons) for t in trsts}


def test_hard_clip_and_supplementary_records(tmp_path):
    """Supplementary (0x800) records with hard/soft clips flow through the
    scan unfiltered, like the reference (generator.cc:87-91 filters only
    unmapped/secondary/cigar-count/quality)."""
    from aletsch_tpu.sim import simulate_pairs, write_bam, GENE_A_ISO1
    from aletsch_tpu.io.bam import CMATCH, CHARD, CSOFT, CREF_SKIP
    rng = random.Random(8)
    recs = simulate_pairs(GENE_A_ISO1, 50, "+", rng, prefix="n")
    for k in range(10):
        cig = [(CHARD, 20), (CMATCH, 50), (CREF_SKIP, 4700),
               (CMATCH, 40), (CSOFT, 15)]
        recs.append(dict(qname="sup.%d" % k, flag=0x800, pos=10250,
                         cigar=cig, mpos=0, isize=0, xs="+"))
    bam = str(tmp_path / "clip.bam")
    write_bam(bam, recs)
    bl = tmp_path / "clip.list"
    bl.write_text("%s x paired_end\n" % bam)
    params = default_params()
    out_dir = str(tmp_path / "gtf")
    os.makedirs(out_dir)
    for p in params:
        p.input_bam_list = str(bl)
        p.output_gtf_file = str(tmp_path / "meta.gtf")
        p.output_gtf_dir = out_dir
        p.verbose = 0
    Incubator(params).resolve()
    trsts = read_gtf(str(tmp_path / "meta.gtf"))
    assert intron_chain(GENE_A_ISO1) in {intron_chain(t.exons)
                                         for t in trsts}
