"""Wave-batched device greedy DP: kernel oracle + production parity.

The greedy max-path extraction is a cold path in default aletsch configs
(the resolution ladder fully decomposes every strand-pure graph below
max_num_exons; see docs/DESIGN.md "greedy decomposition on device").  A low
max_num_exons routes large graphs straight to the greedy loop
(scallop.cc:49), which is how these tests exercise the device path
end-to-end — device on/off must be byte-identical under the same config.
"""

import os
import random

import numpy as np
import pytest

from aletsch_tpu.ops import greedy_dp


def test_kernel_matches_host_oracle():
    rng = np.random.default_rng(0)
    B, V = 8, 32
    W = np.triu(rng.uniform(0.0, 10.0, (B, V, V)).astype(np.float32), 1)
    W = np.where((rng.uniform(size=W.shape) < 0.3) & (W > 0), W,
                 np.float32(greedy_dp.NEG))
    fn = greedy_dp.get_greedy_fn(V)
    got = np.asarray(fn(W))
    want = greedy_dp.single_source_host(W)
    assert np.array_equal(got, want)


def test_kernel_unreachable_stays_neg():
    W = np.full((1, 8, 8), greedy_dp.NEG, dtype=np.float32)
    W[0, 0, 1] = 3.0
    W[0, 1, 2] = 2.0
    fn = greedy_dp.get_greedy_fn(8)
    t = np.asarray(fn(W))[0]
    assert t[0] == greedy_dp.POS
    assert t[1] == 3.0
    assert t[2] == 2.0
    assert np.all(t[3:] == greedy_dp.NEG)


def _cohort(tmp_path, n_loci=10):
    from aletsch_tpu.sim import simulate_adversarial_sample
    b0 = str(tmp_path / "s0.bam")
    b1 = str(tmp_path / "s1.bam")
    simulate_adversarial_sample(b0, seed=11, n_loci=n_loci)
    simulate_adversarial_sample(b1, seed=12, n_loci=n_loci)
    lst = str(tmp_path / "bams.list")
    with open(lst, "w") as fh:
        fh.write("%s %s.bai paired_end\n%s %s.bai paired_end\n"
                 % (b0, b0, b1, b1))
    return lst


def _run(tmp_path, lst, sub, device, max_exons):
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
        p.device_greedy = device
        p.device_min_vertices = 2
        p.device_min_groups = 0
        p.max_num_exons = max_exons
    Incubator(params).resolve()
    files = {"meta.gtf": (out / "meta.gtf").read_bytes()}
    for f in sorted(os.listdir(out / "gtf")):
        files[f] = (out / "gtf" / f).read_bytes()
    return files


@pytest.mark.skipif(os.environ.get("ALETSCH_NATIVE_CORE") == "0",
                    reason="device path requires the native core")
def test_device_greedy_parity_and_engagement(tmp_path):
    from aletsch_tpu.meta import device_wave
    lst = _cohort(tmp_path)
    # max_num_exons=8 sends every larger graph straight to the greedy
    # loop (scallop.cc:49 break fires before any ladder rung)
    off = _run(tmp_path, lst, "off", "off", 8)
    steps0 = device_wave.stats["device_steps"]
    on = _run(tmp_path, lst, "on", "on", 8)
    assert off == on
    assert device_wave.stats["device_steps"] > steps0, \
        "device path never engaged (greedy stayed cold)"


@pytest.mark.skipif(os.environ.get("ALETSCH_NATIVE_CORE") == "0",
                    reason="device path requires the native core")
def test_device_greedy_default_config_parity(tmp_path):
    """Default max_num_exons: greedy is cold, but the device wave
    orchestration must still be byte-transparent."""
    lst = _cohort(tmp_path, n_loci=6)
    off = _run(tmp_path, lst, "doff", "off", 10000)
    on = _run(tmp_path, lst, "don", "on", 10000)
    assert off == on


@pytest.mark.skipif(os.environ.get("ALETSCH_NATIVE_CORE") == "0",
                    reason="compares native vs device clustering")
def test_device_similarity_parity(tmp_path):
    """--device_similarity on (MXU matmul clustering path) must be
    byte-identical to the native intersections (meta/bundle_group.py)."""
    from aletsch_tpu.config import default_params
    from aletsch_tpu.meta.incubator import Incubator
    lst = _cohort(tmp_path, n_loci=8)
    outs = {}
    for mode in ("off", "on"):
        out = tmp_path / ("sim_" + mode)
        (out / "gtf").mkdir(parents=True)
        params = default_params()
        for p in params:
            p.input_bam_list = lst
            p.output_gtf_file = str(out / "meta.gtf")
            p.output_gtf_dir = str(out / "gtf")
            p.verbose = 0
            p.device_similarity = mode
        Incubator(params).resolve()
        outs[mode] = (out / "meta.gtf").read_bytes()
    assert outs["off"] == outs["on"]
