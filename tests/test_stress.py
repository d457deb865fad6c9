"""Adversarial robustness: random read soups, overlapping genes, odd flags,
single-exon output mode."""

import os
import random

from aletsch_tpu.config import default_params
from aletsch_tpu.io.gtf import read_gtf
from aletsch_tpu.meta.incubator import Incubator
from aletsch_tpu.sim import simulate_pairs, write_bam


def run(tmp_path, recs_per_sample, extra=lambda p: None, tag="x"):
    bams = []
    for s, recs in enumerate(recs_per_sample):
        p = str(tmp_path / ("%s%d.bam" % (tag, s)))
        write_bam(p, recs, names=("chr1",), lengths=(10**6,))
        bams.append(p)
    bl = tmp_path / (tag + ".list")
    bl.write_text("".join("%s %s.bai paired_end\n" % (b, b) for b in bams))
    out_gtf = str(tmp_path / (tag + ".gtf"))
    out_dir = str(tmp_path / (tag + "_gtf"))
    os.makedirs(out_dir, exist_ok=True)
    params = default_params()
    for p in params:
        p.input_bam_list = str(bl)
        p.output_gtf_file = out_gtf
        p.output_gtf_dir = out_dir
        p.verbose = 0
        extra(p)
    inc = Incubator(params)
    inc.resolve()
    return out_gtf


def random_soup(rng, n=600):
    """Random reads with random gaps/strands — no consistent structure."""
    recs = []
    for i in range(n):
        pos = rng.randint(1000, 500000)
        style = rng.random()
        if style < 0.4:
            cigar = "%dM" % rng.randint(30, 150)
        elif style < 0.8:
            cigar = "%dM%dN%dM" % (rng.randint(20, 80),
                                   rng.randint(40, 5000),
                                   rng.randint(20, 80))
        else:
            cigar = "%dM%dN%dM%dN%dM" % (rng.randint(10, 50),
                                         rng.randint(40, 2000),
                                         rng.randint(10, 50),
                                         rng.randint(40, 2000),
                                         rng.randint(10, 50))
        xs = rng.choice("+-..")
        flag = rng.choice([0, 16])
        recs.append(dict(qname="r%d" % i, flag=flag, pos=pos,
                         cigar=cigar, mpos=-1, isize=0, xs=xs))
    return recs


def test_random_soup_does_not_crash(tmp_path):
    rng = random.Random(99)
    out = run(tmp_path, [random_soup(rng), random_soup(rng)], tag="soup")
    # just completing + parseable output is the contract here
    read_gtf(out)


def test_overlapping_opposite_strand_genes(tmp_path):
    rng = random.Random(7)
    plus = [(10000, 10400), (12000, 12400)]
    minus = [(10200, 10600), (12200, 12600)]     # overlaps plus gene
    recs = []
    recs += simulate_pairs(plus, 60, "+", rng, prefix="p")
    recs += simulate_pairs(minus, 60, "-", rng, prefix="m")
    out = run(tmp_path, [recs, recs], tag="ovl")
    trsts = read_gtf(out)
    strands = {t.strand for t in trsts}
    assert "+" in strands and "-" in strands


def test_single_exon_output_mode(tmp_path):
    rng = random.Random(3)
    # an unspliced "gene": plain deep coverage over one interval
    recs = []
    for i in range(300):
        pos = 50000 + rng.randint(0, 400)
        recs.append(dict(qname="u%d" % i, flag=0, pos=pos,
                         cigar="100M", mpos=-1, isize=0, xs="."))
    spliced = simulate_pairs([(200000, 200400), (205000, 205400)], 50, "+",
                             rng, prefix="sp")

    def enable(p):
        p.skip_single_exon_transcripts = False

    out = run(tmp_path, [recs + spliced, recs + spliced], extra=enable,
              tag="se")
    trsts = read_gtf(out)
    n_single = sum(1 for t in trsts if len(t.exons) == 1)
    n_multi = sum(1 for t in trsts if len(t.exons) >= 2)
    assert n_multi >= 1
    assert n_single >= 1
    se = [t for t in trsts if len(t.exons) == 1][0]
    assert 49000 < se.exons[0][0] < 51000


def test_uniquely_mapped_only(tmp_path):
    rng = random.Random(5)
    recs = simulate_pairs([(10000, 10400), (15000, 15400)], 60, "+", rng,
                          prefix="q")
    # mark half the reads as multi-mapped (nh=5)
    for i, r in enumerate(recs):
        r["nh"] = 5 if i % 2 == 0 else 1

    def enable(p):
        p.uniquely_mapped_only = True

    # must run without crashing; bridged output may shrink
    out = run(tmp_path, [recs, recs], extra=enable, tag="um")
    read_gtf(out)
