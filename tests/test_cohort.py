"""Cohort-scale and determinism tests."""

import os
import random

import pytest

from aletsch_tpu.config import default_params
from aletsch_tpu.io.gtf import read_gtf
from aletsch_tpu.meta.incubator import Incubator
from aletsch_tpu.sim import simulate_pairs, write_bam


def run_cohort(tmp_path, n_samples, genes, max_group_size=200, seed0=100,
               depth=40, tag=""):
    bams = []
    for s in range(n_samples):
        rng = random.Random(seed0 + s)
        recs = []
        for gi, exons in enumerate(genes):
            strand = "+" if gi % 2 == 0 else "-"
            recs += simulate_pairs(exons, depth, strand, rng,
                                   prefix="s%dg%d" % (s, gi))
        p = str(tmp_path / ("%ss%d.bam" % (tag, s)))
        write_bam(p, recs, names=("chr1",), lengths=(10**7,))
        bams.append(p)
    bl = tmp_path / (tag + "bams.list")
    bl.write_text("".join("%s %s.bai paired_end\n" % (b, b) for b in bams))
    out_gtf = str(tmp_path / (tag + "meta.gtf"))
    out_dir = str(tmp_path / (tag + "gtf"))
    os.makedirs(out_dir, exist_ok=True)
    params = default_params()
    for p in params:
        p.input_bam_list = str(bl)
        p.output_gtf_file = out_gtf
        p.output_gtf_dir = out_dir
        p.max_group_size = max_group_size
        p.verbose = 0
    inc = Incubator(params)
    inc.resolve()
    return out_gtf, inc


def make_genes(n, seed=5):
    rng = random.Random(seed)
    genes = []
    pos = 50000
    for g in range(n):
        ne = rng.randint(2, 4)
        exons = []
        p = pos
        for e in range(ne):
            el = rng.randint(200, 400)
            exons.append((p, p + el))
            p += el + rng.randint(500, 1500)
        genes.append(exons)
        pos = p + rng.randint(40000, 60000)
    return genes


def intron_chain(exons):
    return tuple((exons[k - 1][1], exons[k][0]) for k in range(1, len(exons)))


def test_ten_sample_cohort(tmp_path):
    genes = make_genes(6)
    out_gtf, inc = run_cohort(tmp_path, 10, genes, max_group_size=20,
                              depth=25)
    trsts = read_gtf(out_gtf)
    chains = {intron_chain(t.exons) for t in trsts}
    found = sum(1 for g in genes if intron_chain(g) in chains)
    assert found == len(genes)
    # every gene supported by all 10 samples plus the combined instance
    with open(out_gtf) as fh:
        counts = [int(l.split('count "')[1].split('"')[0])
                  for l in fh if "\ttranscript\t" in l]
    assert max(counts) >= 10


def test_determinism(tmp_path):
    genes = make_genes(4)
    g1, _ = run_cohort(tmp_path, 2, genes, tag="a")
    g2, _ = run_cohort(tmp_path, 2, genes, tag="b")
    assert open(g1).read() == open(g2).read()


def test_fuzz_recovery(tmp_path):
    """Random gene structures: assembled intron chains must be a subset of
    the simulated ones, and deep isoforms must be recovered."""
    rng = random.Random(123)
    genes = make_genes(8, seed=9)
    out_gtf, inc = run_cohort(tmp_path, 2, genes, depth=60)
    trsts = read_gtf(out_gtf)
    truth = {intron_chain(g) for g in genes}
    for t in trsts:
        if len(t.exons) < 2:
            continue
        assert intron_chain(t.exons) in truth, t.exons
    found = {intron_chain(t.exons) for t in trsts if len(t.exons) >= 2}
    assert len(found & truth) == len(truth)


def test_exon_skip_isoform_resolution(tmp_path):
    """Two isoforms per gene (full chain + exon-skip) at 60:25 depth must
    both be recovered — the phasing-path decomposition's core claim
    (scallop.cc resolution ladder + hyper-set paths)."""
    import random
    from aletsch_tpu.sim import simulate_pairs, write_bam

    def make_gene(g, rng):
        off = 50000 + g * 100000
        exons, p = [], off
        for e in range(rng.randint(3, 5)):
            el = rng.randint(150, 400)
            exons.append((p, p + el))
            p += el + rng.randint(500, 2000)
        skip = rng.randint(1, len(exons) - 2)
        return exons, exons[:skip] + exons[skip + 1:]

    def chain(exons):
        return tuple((exons[k - 1][1], exons[k][0])
                     for k in range(1, len(exons)))

    rng = random.Random(777)
    genes = [make_gene(g, rng) for g in range(8)]
    bams = []
    for s in range(2):
        srng = random.Random(40 + s)
        recs = []
        for g, (A, B) in enumerate(genes):
            st = "+" if g % 2 == 0 else "-"
            recs += simulate_pairs(A, 60, st, srng, prefix="a%d_%d" % (s, g))
            recs += simulate_pairs(B, 25, st, srng, prefix="b%d_%d" % (s, g))
        p = str(tmp_path / ("s%d.bam" % s))
        write_bam(p, recs, ("chr1",), (10**7,))
        bams.append(p)
    bl = tmp_path / "bams.list"
    bl.write_text("".join("%s x paired_end\n" % b for b in bams))
    params = default_params()
    out_dir = str(tmp_path / "gtf")
    os.makedirs(out_dir)
    for p in params:
        p.input_bam_list = str(bl)
        p.output_gtf_file = str(tmp_path / "meta.gtf")
        p.output_gtf_dir = out_dir
        p.verbose = 0
    Incubator(params).resolve()
    got = {chain(t.exons) for t in read_gtf(str(tmp_path / "meta.gtf"))
           if len(t.exons) > 1}
    for A, B in genes:
        assert chain(A) in got, "major isoform missing"
        assert chain(B) in got, "exon-skip isoform missing"


def test_antisense_overlap_and_alt_ends(tmp_path):
    """Adversarial structures: (a) '+' and '-' genes overlapping the same
    coordinates (strand routing must separate them); (b) isoforms with
    alternative first/last exons (boundary grouping must keep both)."""
    import random
    from aletsch_tpu.sim import simulate_pairs, write_bam

    def chain(exons):
        return tuple((exons[k - 1][1], exons[k][0])
                     for k in range(1, len(exons)))

    # (a) antisense pair sharing an interval
    fwd = [(50000, 50400), (55000, 55300), (60000, 60500)]
    rev = [(54000, 54350), (58000, 58300), (62000, 62400)]
    # (b) alt-TSS / alt-polyA: shared middle exon, different first and last
    altA = [(200000, 200300), (205000, 205200), (210000, 210400)]
    altB = [(202000, 202250), (205000, 205200), (213000, 213350)]
    bams = []
    for s in range(2):
        rng = random.Random(90 + s)
        recs = []
        recs += simulate_pairs(fwd, 50, "+", rng, prefix="f%d" % s)
        recs += simulate_pairs(rev, 50, "-", rng, prefix="r%d" % s)
        recs += simulate_pairs(altA, 50, "+", rng, prefix="x%d" % s)
        recs += simulate_pairs(altB, 50, "+", rng, prefix="y%d" % s)
        p = str(tmp_path / ("s%d.bam" % s))
        write_bam(p, recs, ("chr1",), (10**6,))
        bams.append(p)
    bl = tmp_path / "bams.list"
    bl.write_text("".join("%s x paired_end\n" % b for b in bams))
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
    by_strand = {}
    for t in trsts:
        if len(t.exons) > 1:
            by_strand.setdefault(t.strand, set()).add(chain(t.exons))
    assert chain(fwd) in by_strand.get("+", set())
    assert chain(rev) in by_strand.get("-", set())
    assert chain(altA) in by_strand.get("+", set())
    assert chain(altB) in by_strand.get("+", set())
