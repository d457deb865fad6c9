"""End-to-end parity for the device scallop ladder (pause kind 4).

device_ladder forced on must produce byte-identical outputs to the host
path: the native export (core_ladder_export), the batched kernel
(ops/ladder_kernel.py), and the native replay (ladder_replay) together
reproduce the host ladder exactly on the IEEE-f64 CPU backend (trust
mode), and verify mode degrades to the authoritative host ladder with
full agreement stats.
"""

import os

import pytest

needs_native = pytest.mark.skipif(
    os.environ.get("ALETSCH_NATIVE_CORE") == "0",
    reason="device path requires the native core")


def _cohort(tmp_path, n_loci=10):
    from aletsch_tpu.sim import simulate_adversarial_sample
    b0 = str(tmp_path / "s0.bam")
    b1 = str(tmp_path / "s1.bam")
    simulate_adversarial_sample(b0, seed=31, n_loci=n_loci)
    simulate_adversarial_sample(b1, seed=32, n_loci=n_loci)
    lst = str(tmp_path / "bams.list")
    with open(lst, "w") as fh:
        fh.write("%s %s.bai paired_end\n%s %s.bai paired_end\n"
                 % (b0, b0, b1, b1))
    return lst


def _run(tmp_path, lst, sub, ladder):
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
        p.device_ladder = ladder
        p.device_min_groups = 0
    Incubator(params).resolve()
    files = {"meta.gtf": (out / "meta.gtf").read_bytes()}
    for f in sorted(os.listdir(out / "gtf")):
        files[f] = (out / "gtf" / f).read_bytes()
    return files


@needs_native
def test_ladder_e2e_parity_trust(tmp_path):
    from aletsch_tpu.meta import device_wave, native_core
    lst = _cohort(tmp_path)
    off = _run(tmp_path, lst, "off", "off")
    agree0, total0 = map(int, native_core.ladder_stats)
    on = _run(tmp_path, lst, "on", "on")
    assert on == off
    ldev = device_wave._get_ladder_device()
    assert ldev is not None and ldev.stats["ladder_graphs"] > 0, \
        "device ladder never engaged"
    assert ldev.stats["ladder_decisions"] > 0
    # trust mode on exact f64: every replayed decision applied cleanly
    agree, total = map(int, native_core.ladder_stats)
    assert total > total0
    assert agree - agree0 == total - total0
    # amortization: far fewer dispatches than graphs
    d = ldev.stats["ladder_dispatches"]
    g = ldev.stats["ladder_graphs"]
    assert d * 4 <= g or d <= 4


@needs_native
def test_ladder_e2e_parity_verify(tmp_path, monkeypatch):
    """Simulated non-exact backend: host ladder authoritative, bytes
    unchanged, agreement stats fully matching on this exact backend."""
    from aletsch_tpu.meta import device_wave, native_core
    lst = _cohort(tmp_path, n_loci=8)
    off = _run(tmp_path, lst, "voff", "off")
    monkeypatch.setattr(device_wave, "_LADDER_TRUST", False)
    agree0, total0 = map(int, native_core.ladder_stats)
    on = _run(tmp_path, lst, "von", "on")
    assert on == off
    agree, total = map(int, native_core.ladder_stats)
    assert total > total0
    assert agree - agree0 == total - total0
