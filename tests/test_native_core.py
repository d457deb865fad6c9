"""Native assembly core: dispatch + byte parity against the Python path.

The core (native/core.cpp via meta/native_core.py) must (a) actually fire
for scanner-produced bundles — a broken eligibility check degrades to the
slow path silently — and (b) produce byte-identical GTF + feature output
with ALETSCH_NATIVE_CORE on and off.
"""

import os

import pytest

from aletsch_tpu.config import default_params
from aletsch_tpu.meta.incubator import Incubator
from aletsch_tpu.meta import native_core
from aletsch_tpu.sim import simulate_sample

from aletsch_tpu.io.bam_native import native_available


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
def test_native_core_fires_and_matches(tmp_path):
    tmp = str(tmp_path)
    b0 = os.path.join(tmp, "s0.bam")
    b1 = os.path.join(tmp, "s1.bam")
    simulate_sample(b0, seed=41)
    simulate_sample(b1, seed=42)
    bl = os.path.join(tmp, "bams.list")
    with open(bl, "w") as fh:
        fh.write("%s x paired_end\n%s x paired_end\n" % (b0, b1))

    before = native_core.stats["native_groups"]
    g1, d1 = _run(tmp, "native", bl)
    assert native_core.stats["native_groups"] > before, \
        "native core never dispatched for scanner bundles"

    os.environ["ALETSCH_NATIVE_CORE"] = "0"
    try:
        g2, d2 = _run(tmp, "python", bl)
    finally:
        del os.environ["ALETSCH_NATIVE_CORE"]

    assert open(g1).read() == open(g2).read()
    for fn in sorted(os.listdir(d1)):
        assert open(os.path.join(d1, fn)).read() == \
            open(os.path.join(d2, fn)).read(), fn
