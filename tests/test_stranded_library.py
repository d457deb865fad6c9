"""FR_FIRST (dUTP) library: inference + stranded generator routing e2e."""

import os
import random

from aletsch_tpu.config import default_params
from aletsch_tpu.constants import FR_FIRST
from aletsch_tpu.io.gtf import read_gtf
from aletsch_tpu.meta.incubator import Incubator
from aletsch_tpu.sim import simulate_pairs, write_bam


def test_fr_first_end_to_end(tmp_path):
    rng = random.Random(13)
    genes = []
    pos = 50000
    for g in range(12):
        ne = rng.randint(2, 4)
        exons = []
        p = pos
        for e in range(ne):
            el = rng.randint(200, 400)
            exons.append((p, p + el))
            p += el + rng.randint(500, 1200)
        genes.append(exons)
        pos = p + rng.randint(40000, 60000)
    bams = []
    for s in range(2):
        srng = random.Random(60 + s)
        recs = []
        for gi, exons in enumerate(genes):
            strand = "+" if gi % 2 == 0 else "-"
            recs += simulate_pairs(exons, 60, strand, srng,
                                   prefix="s%dg%d" % (s, gi),
                                   library="fr_first")
        p = str(tmp_path / ("s%d.bam" % s))
        write_bam(p, recs, names=("chr1",), lengths=(10**7,))
        bams.append(p)
    bl = tmp_path / "bams.list"
    bl.write_text("".join("%s %s.bai paired_end\n" % (b, b) for b in bams))
    out_gtf = str(tmp_path / "meta.gtf")
    out_dir = str(tmp_path / "gtf")
    os.makedirs(out_dir)
    params = default_params()
    for p in params:
        p.input_bam_list = str(bl)
        p.output_gtf_file = out_gtf
        p.output_gtf_dir = out_dir
        p.verbose = 0
    inc = Incubator(params)
    inc.resolve()
    # library type inferred from flag/XS agreement
    assert inc.samples[0].library_type == FR_FIRST
    assert inc.samples[1].library_type == FR_FIRST
    trsts = read_gtf(out_gtf)

    def chain(t):
        return tuple((t.exons[k - 1][1], t.exons[k][0])
                     for k in range(1, len(t.exons)))
    truth = {}
    for gi, g in enumerate(genes):
        truth[tuple((g[k - 1][1], g[k][0]) for k in range(1, len(g)))] = \
            "+" if gi % 2 == 0 else "-"
    found = {chain(t): t.strand for t in trsts if len(t.exons) >= 2}
    hits = sum(1 for c, s in truth.items() if found.get(c) == s)
    assert hits == len(truth)
