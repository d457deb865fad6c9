"""Whole-pipeline differential: native columnar paths vs pure-Python
fallback must produce byte-identical output."""

import os
import random

import pytest

import aletsch_tpu.io.bam_native as bam_native
from aletsch_tpu.config import default_params
from aletsch_tpu.meta.incubator import Incubator
from aletsch_tpu.sim import simulate_pairs, write_bam


@pytest.mark.skipif(not bam_native.native_available(),
                    reason="libabam unavailable")
def test_full_pipeline_native_vs_python(tmp_path, monkeypatch):
    rng = random.Random(77)
    genes = []
    pos = 30000
    for g in range(10):
        ne = rng.randint(2, 5)
        exons = []
        p = pos
        for e in range(ne):
            el = rng.randint(150, 450)
            exons.append((p, p + el))
            p += el + rng.randint(400, 1500)
        genes.append(exons)
        pos = p + rng.randint(30000, 50000)
    bams = []
    for s in range(3):
        srng = random.Random(800 + s)
        recs = []
        for gi, exons in enumerate(genes):
            strand = "+" if gi % 2 == 0 else "-"
            recs += simulate_pairs(exons, srng.randint(10, 40), strand, srng,
                                   prefix="s%dg%d" % (s, gi))
        p = str(tmp_path / ("s%d.bam" % s))
        write_bam(p, recs, names=("chr1",), lengths=(10**6,))
        bams.append(p)
    bl = tmp_path / "bams.list"
    bl.write_text("".join("%s %s.bai paired_end\n" % (b, b) for b in bams))

    def run(tag):
        out_gtf = str(tmp_path / (tag + ".gtf"))
        out_dir = str(tmp_path / (tag + "_gtf"))
        os.makedirs(out_dir, exist_ok=True)
        params = default_params()
        for p in params:
            p.input_bam_list = str(bl)
            p.output_gtf_file = out_gtf
            p.output_gtf_dir = out_dir
            p.verbose = 0
        Incubator(params).resolve()
        return out_gtf, out_dir

    g_native, d_native = run("native")
    monkeypatch.setattr(bam_native, "_LIB", None)
    monkeypatch.setattr(bam_native, "_LIB_TRIED", True)
    assert not bam_native.native_available()
    g_py, d_py = run("python")

    assert open(g_native).read() == open(g_py).read()
    for sid in range(4):
        a = open(os.path.join(d_native, "%d.gtf" % sid)).read()
        b = open(os.path.join(d_py, "%d.gtf" % sid)).read()
        assert a == b
        fa = open(os.path.join(d_native, "%d.trstFeature.csv" % sid)).read()
        fb = open(os.path.join(d_py, "%d.trstFeature.csv" % sid)).read()
        assert fa == fb


@pytest.mark.skipif(not bam_native.native_available(),
                    reason="libabam unavailable")
def test_scanner_vs_batched_vs_serial(tmp_path, monkeypatch):
    """Three-way differential: C++ scanner path == native batched loop ==
    serial (threadless) waves, on a randomized cohort with indels,
    multi-chromosome genes and duplicate positions."""
    rng = random.Random(555)
    from aletsch_tpu.io.bam import CINS, CDEL, CMATCH, CREF_SKIP

    def gene(pos):
        exons = []
        p = pos
        for e in range(rng.randint(2, 4)):
            el = rng.randint(120, 380)
            exons.append((p, p + el))
            p += el + rng.randint(300, 1200)
        return exons

    genes1 = [gene(30000 + g * 25000) for g in range(6)]
    genes2 = [gene(40000 + g * 25000) for g in range(4)]
    bams = []
    for s in range(3):
        srng = random.Random(900 + s)
        recs = []
        for tid, genes in ((0, genes1), (1, genes2)):
            for gi, exons in enumerate(genes):
                strand = "+" if (gi + tid) % 2 == 0 else "-"
                rr = simulate_pairs(exons, srng.randint(15, 45), strand,
                                    srng, prefix="t%ds%dg%d" % (tid, s, gi))
                for rec in rr:
                    rec["tid"] = tid
                    rec["mtid"] = tid
                recs += rr
        # inject records with indels in the cigar
        for k in range(10):
            exons = genes1[k % len(genes1)]
            a, b = exons[0]
            cig = [(CMATCH, 40), (CINS, 3), (CMATCH, 30),
                   (CDEL, 2), (CMATCH, 28)]
            recs.append(dict(qname="ind%d.%d" % (s, k), flag=0, tid=0,
                             mtid=0, pos=a + 5, cigar=cig, mpos=a + 5,
                             isize=100, xs="."))
        p = str(tmp_path / ("m%d.bam" % s))
        write_bam(p, recs, names=("chrA", "chrB"), lengths=(10**6, 10**6))
        bams.append(p)
    bl = tmp_path / "mix.list"
    bl.write_text("".join("%s x paired_end\n" % b for b in bams))

    def run(tag):
        out_gtf = str(tmp_path / (tag + ".gtf"))
        out_dir = str(tmp_path / (tag + "_gtf"))
        os.makedirs(out_dir, exist_ok=True)
        params = default_params()
        for p in params:
            p.input_bam_list = str(bl)
            p.output_gtf_file = out_gtf
            p.output_gtf_dir = out_dir
            p.verbose = 0
        Incubator(params).resolve()
        return out_gtf, out_dir

    g_scan, d_scan = run("scan")

    from aletsch_tpu.io.bam_native import NativeBamReader
    monkeypatch.delattr(NativeBamReader, "scan_region")
    monkeypatch.delattr(NativeBamReader, "scan_preview")
    g_batch, d_batch = run("batch")

    import os as _os
    monkeypatch.setattr(_os, "cpu_count", lambda: 1)   # serial waves
    g_serial, d_serial = run("serial")

    ref = open(g_scan).read()
    assert ref == open(g_batch).read()
    assert ref == open(g_serial).read()
    for d in (d_batch, d_serial):
        for fn in sorted(_os.listdir(d_scan)):
            assert open(_os.path.join(d_scan, fn)).read() == \
                open(_os.path.join(d, fn)).read()
