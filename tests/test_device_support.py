"""Device cross-sample junction-support reduce: kernel oracle + production
parity with the wave-batched path forced on (ops/support.py + the kind-3
GroupRun pause in native/core.cpp; host reference: sorted-key sums in
meta/assembler.py junction_support / assembler.cc:375-417)."""

import os

import numpy as np
import pytest

from aletsch_tpu.ops import support


def test_kernel_matches_host_oracle():
    rng = np.random.default_rng(3)
    jw = rng.integers(0, 1000, size=(8, support.DEFAULT_NS,
                                     support.DEFAULT_J)).astype(np.float32)
    fn = support.get_support_fn()
    got = np.asarray(fn(jw))
    assert np.array_equal(got, support.support_sum_host(jw))


def _cohort(tmp_path):
    # shared loci coordinates across samples so bundle_group builds
    # multi-sample groups (phase >= 2: the support maps are non-trivial)
    from aletsch_tpu.sim import simulate_sample
    b0 = str(tmp_path / "s0.bam")
    b1 = str(tmp_path / "s1.bam")
    simulate_sample(b0, seed=41)
    simulate_sample(b1, seed=42)
    lst = str(tmp_path / "bams.list")
    with open(lst, "w") as fh:
        fh.write("%s %s.bai paired_end\n%s %s.bai paired_end\n"
                 % (b0, b0, b1, b1))
    return lst


def _run(tmp_path, lst, sub, device_support):
    from aletsch_tpu.config import default_params
    from aletsch_tpu.meta.incubator import Incubator
    out = tmp_path / sub
    (out / "gtf").mkdir(parents=True)
    params = default_params()
    for p in params:
        p.input_bam_list = lst
        p.output_gtf_file = str(out / "meta.gtf")
        p.output_gtf_dir = str(out / "gtf")
        p.verbose = 0
        p.device_support = device_support
    Incubator(params).resolve()
    files = {"meta.gtf": (out / "meta.gtf").read_bytes()}
    for f in sorted(os.listdir(out / "gtf")):
        files[f] = (out / "gtf" / f).read_bytes()
    return files


@pytest.mark.skipif(os.environ.get("ALETSCH_NATIVE_CORE") == "0",
                    reason="device support requires the native core")
def test_device_support_parity_and_engagement(tmp_path):
    """--device_support on must be byte-identical to the host sums and
    must actually consume device results."""
    from aletsch_tpu.meta import device_wave
    lst = _cohort(tmp_path)
    off = _run(tmp_path, lst, "off", "off")
    before = device_wave.stats["device_support_groups"]
    on = _run(tmp_path, lst, "on", "on")
    assert off == on
    assert device_wave.stats["device_support_groups"] > before, \
        "device support reduce never engaged"
