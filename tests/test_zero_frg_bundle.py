"""A bundle with zero pairable fragments must reach the native core with
0 fragments — not a phantom (0,0) self-pair.

Regression for the marshalling bug where an empty _scan_frgs array was
replaced by the 2-element zeros placeholder and its size (2) still fed the
pair count, injecting one (0,0) fragment.  The reference rebuilds
fragments per bundle and never self-pairs (bundle_base.cc:267-323
`u == i` skip), so gr_reads for such a bundle is 0; the phantom made it 1
(the last byte-parity residual at production scale, 2 feature-CSV rows).

The cohort engineers the shape: sample 1 holds a lone spliced read whose
mate is dropped by the mapq filter, forming a 1-hit bundle that groups
with sample 0's full-coverage bundle and assembles into a feature row.
"""

import os
import random

import pytest

from aletsch_tpu.config import default_params
from aletsch_tpu.meta.incubator import Incubator
from aletsch_tpu.io.bam_native import native_available
from aletsch_tpu.sim import simulate_pairs, write_bam

EXONS = [(5000, 5300), (7000, 7300)]


def _make_cohort(tmp):
    rng = random.Random(7)
    b0 = os.path.join(tmp, "s0.bam")
    recs0 = simulate_pairs(EXONS, 40, "+", rng, prefix="a")
    # second gene so both samples profile on real pairs
    recs0 += simulate_pairs([(50000, 50400), (52000, 52400)], 40, "+", rng,
                            prefix="b")
    write_bam(b0, recs0)

    b1 = os.path.join(tmp, "s1.bam")
    recs1 = simulate_pairs([(50000, 50400), (52000, 52400)], 40, "+", rng,
                           prefix="c")
    # the lone spliced read: paired flags, mate nearby but written with
    # mapq 0 so the scanner drops it (min_mapping_quality default 1) —
    # the survivor can never pair, so its bundle has 1 hit / 0 frgs
    recs1.append(dict(qname="lone.0", flag=0x1 | 0x10 | 0x80, pos=5200,
                      cigar=[(0, 100), (3, 1700), (0, 100)],
                      mpos=5040, isize=-1260, xs="+"))
    recs1.append(dict(qname="lone.0", flag=0x1 | 0x20 | 0x40, pos=5040,
                      cigar=[(0, 100)], mpos=5200, isize=1260, xs=".",
                      mapq=0))
    write_bam(b1, recs1)

    bl = os.path.join(tmp, "bams.list")
    with open(bl, "w") as fh:
        fh.write("%s x paired_end\n%s x paired_end\n" % (b0, b1))
    return bl


def _run(tmp, tag, bl):
    out_gtf = os.path.join(tmp, tag + ".gtf")
    out_dir = os.path.join(tmp, tag + "_d")
    os.makedirs(out_dir, exist_ok=True)
    params = default_params()
    for p in params:
        p.input_bam_list = bl
        p.output_gtf_file = out_gtf
        p.output_gtf_dir = out_dir
        p.verbose = 0
    Incubator(params).resolve()
    return out_gtf, out_dir


@pytest.mark.skipif(not native_available(), reason="no native library")
def test_zero_frg_bundle_native_matches_python(tmp_path):
    tmp = str(tmp_path)
    bl = _make_cohort(tmp)

    g1, d1 = _run(tmp, "native", bl)

    os.environ["ALETSCH_NATIVE_CORE"] = "0"
    try:
        g2, d2 = _run(tmp, "python", bl)
    finally:
        del os.environ["ALETSCH_NATIVE_CORE"]

    assert open(g1).read() == open(g2).read()
    for fn in sorted(os.listdir(d1)):
        assert open(os.path.join(d1, fn)).read() == \
            open(os.path.join(d2, fn)).read(), fn

    # the lone-read bundle must have produced a feature row with
    # gr_reads == 0 (column 12, transcript.cc:386) — if this stops
    # holding, the cohort no longer exercises the zero-frg shape
    rows = [ln.split("\t")
            for ln in open(os.path.join(d1, "1.trstFeature.csv"))]
    zero = [r for r in rows if len(r) > 12 and r[12] == "0"]
    assert zero, "no gr_reads==0 row: cohort no longer covers 0-frg bundles"
