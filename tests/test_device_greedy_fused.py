"""Fused greedy drain (ops/greedy_fused.py): kernel oracle fuzz, e2e byte
parity (trust + verify modes), and dispatch amortization vs the per-step
path (VERDICT r2 #1: one dispatch per wave round instead of one per
extraction; matches scallop.cc:2874-2897 + splice_graph.cc:819-885)."""

import os

import numpy as np
import pytest

from aletsch_tpu.ops import greedy_fused


def _random_batch(rng, B, V, parallel_free=True):
    W = np.full((B, V, V), greedy_fused.NEG)
    P = np.full((B, V, V), -1, dtype=np.int32)
    sink = np.zeros(B, dtype=np.int32)
    for b in range(B):
        n = int(rng.integers(4, V + 1))
        cnt = np.zeros(n, dtype=int)
        for j in range(1, n):
            k = int(rng.integers(1, min(j, 4) + 1))
            for u in rng.choice(j, size=k, replace=False):
                # mix of integer-ish and sqrt-balanced-like weights,
                # occasional exact ties (host tie-break via P)
                if rng.random() < 0.2:
                    w = float(rng.integers(1, 8))
                else:
                    w = float(rng.integers(1, 1000)) * np.sqrt(rng.random())
                W[b, u, j] = w
                P[b, u, j] = cnt[j]
                cnt[j] += 1
        sink[b] = n - 1
    return W, P, sink


def test_fused_kernel_matches_oracle_fuzz():
    import jax
    rng = np.random.default_rng(42)
    B, V = 16, 24
    fn = greedy_fused.get_fused_fn(B, V, greedy_fused.DEFAULT_P)
    for trial in range(5):
        W, P, sink = _random_batch(rng, B, V)
        mincov = np.full(B, 2.0)
        guard = np.full(B, 0.01)
        smin = np.full(B, 1e-8)
        ph, wh, nh = greedy_fused.drain_host(W, P, sink, mincov, guard,
                                             smin)
        with jax.enable_x64():
            import jax.numpy as jnp
            pd, wd, nd = fn(jnp.asarray(W), jnp.asarray(P),
                            jnp.asarray(sink), jnp.asarray(mincov),
                            jnp.asarray(guard), jnp.asarray(smin))
        assert np.array_equal(np.asarray(nd), nh)
        assert np.array_equal(np.asarray(pd), ph)
        assert np.array_equal(np.asarray(wd).view(np.int64),
                              wh.view(np.int64))
        assert nh.sum() > 0     # the fuzz actually extracts paths


def test_fused_inactive_rows_and_drained():
    import jax
    B, V = 4, 8
    W = np.full((B, V, V), greedy_fused.NEG)
    P = np.full((B, V, V), -1, dtype=np.int32)
    sink = np.zeros(B, dtype=np.int32)
    # graph 1: single path below min coverage -> zero extractions
    W[1, 0, 1], P[1, 0, 1] = 1.5, 0
    W[1, 1, 2], P[1, 1, 2] = 1.5, 0
    sink[1] = 2
    # graph 2: two-path diamond, drains in two extractions
    for (u, v, w) in ((0, 1, 10.0), (1, 3, 10.0), (0, 2, 5.0), (2, 3, 5.0)):
        W[2, u, v] = w
        P[2, u, v] = 0 if u == 0 or v != 3 else 1
    P[2, 1, 3], P[2, 2, 3] = 0, 1
    sink[2] = 3
    fn = greedy_fused.get_fused_fn(B, V, 8)
    args = (W, P, sink, np.full(B, 2.0), np.full(B, 0.01), np.full(B, 1e-8))
    with jax.enable_x64():
        import jax.numpy as jnp
        pd, wd, nd = fn(*[jnp.asarray(a) for a in args])
    nd = np.asarray(nd)
    assert nd.tolist() == [0, 0, 2, 0]
    wd = np.asarray(wd)
    assert wd[2, 0] == 10.0 and wd[2, 1] == 5.0
    ph, wh, nh = greedy_fused.drain_host(*args, maxp=8)
    assert np.array_equal(np.asarray(pd), ph)


def _cohort(tmp_path, n_loci=10):
    from aletsch_tpu.sim import simulate_adversarial_sample
    b0 = str(tmp_path / "s0.bam")
    b1 = str(tmp_path / "s1.bam")
    simulate_adversarial_sample(b0, seed=21, n_loci=n_loci)
    simulate_adversarial_sample(b1, seed=22, n_loci=n_loci)
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


needs_native = pytest.mark.skipif(
    os.environ.get("ALETSCH_NATIVE_CORE") == "0",
    reason="device path requires the native core")


@needs_native
def test_fused_e2e_parity_and_amortization(tmp_path, monkeypatch):
    """Fused forced on == host bytes, and the fused path uses strictly
    fewer dispatches than the per-extraction step path on the same
    workload (the round-2 verdict's 'one dispatch per wave' ask)."""
    from aletsch_tpu.meta import device_wave, native_core
    lst = _cohort(tmp_path)
    off = _run(tmp_path, lst, "off", "off", 8)

    monkeypatch.setenv("ALETSCH_DEVICE_GREEDY", "step")
    sdev = device_wave._get_device()
    d0 = sdev.stats["dispatches"]
    stepped = _run(tmp_path, lst, "step", "on", 8)
    step_dispatches = sdev.stats["dispatches"] - d0
    assert stepped == off

    monkeypatch.delenv("ALETSCH_DEVICE_GREEDY")
    agree0, total0 = map(int, native_core.fused_stats)
    fused = _run(tmp_path, lst, "fused", "on", 8)
    fdev = device_wave._get_fused_device()
    assert fdev is not None, "fused device unavailable"
    assert fused == off
    assert fdev.stats["fused_graphs"] > 0, "fused path never engaged"
    fused_dispatches = fdev.stats["fused_dispatches"]
    assert fused_dispatches < step_dispatches, \
        "fused drain did not amortize dispatches (%d vs %d)" % (
            fused_dispatches, step_dispatches)
    # trust mode on the exact-f64 CPU backend: every path consumed agreed
    agree, total = map(int, native_core.fused_stats)
    assert total > total0
    assert agree - agree0 == total - total0


@needs_native
def test_bridge_phase_batching_parity_and_amortization(tmp_path):
    """device_bridge on: whole-phase instance batching (one pause exports
    every queued pier DP) must be byte-identical to host and must need far
    fewer dispatches than instances."""
    from aletsch_tpu.config import default_params
    from aletsch_tpu.meta import device_wave
    from aletsch_tpu.meta.incubator import Incubator
    lst = _cohort(tmp_path, n_loci=10)
    outs = {}
    for mode in ("off", "on"):
        out = tmp_path / ("br_" + mode)
        (out / "gtf").mkdir(parents=True)
        params = default_params()
        for p in params:
            p.input_bam_list = lst
            p.output_gtf_file = str(out / "meta.gtf")
            p.output_gtf_dir = str(out / "gtf")
            p.verbose = 0
            p.device_bridge = mode
            p.device_min_groups = 0
        Incubator(params).resolve()
        outs[mode] = (out / "meta.gtf").read_bytes()
    assert outs["off"] == outs["on"]
    bdev = device_wave._get_bridge_device()
    insts = bdev.stats["bridge_instances"]
    disp = bdev.stats["bridge_dispatches"]
    assert insts > 0, "bridge device path never engaged"
    assert disp * 4 <= insts or disp <= 4, \
        "bridge dispatches not amortized (%d dispatches / %d instances)" % (
            disp, insts)


@needs_native
def test_fused_verify_mode_parity(tmp_path, monkeypatch):
    """ALETSCH_FUSED_TRUST=0 simulates a non-exact-f64 backend: bytes must
    still match the host and the agreement stats must confirm the device
    paths matched the authoritative host drain (exact backend here)."""
    from aletsch_tpu.meta import device_wave, native_core
    lst = _cohort(tmp_path, n_loci=8)
    off = _run(tmp_path, lst, "voff", "off", 8)
    monkeypatch.setenv("ALETSCH_FUSED_TRUST", "0")
    monkeypatch.setattr(device_wave, "_FUSED_TRUST", False)
    agree0, total0 = map(int, native_core.fused_stats)
    on = _run(tmp_path, lst, "von", "on", 8)
    assert on == off
    agree, total = map(int, native_core.fused_stats)
    assert total > total0
    assert agree - agree0 == total - total0   # exact backend: all agree
