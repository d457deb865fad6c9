"""Device top-K bridging DP: kernel oracle, solver.py DP equality, and
production parity with the wave-batched path forced on.

The kernel (ops/bridge_topk.py) is the device form of the bridging pier DP
(bridge/bridge_solver.cc:484-568); the host references are bridge/solver.py
_dynamic_programming/_trace_back (Python oracle) and native/core_solve.h
BridgeSolver (production).  All three must agree entry-for-entry including
stable tie-breaks, and the end-to-end GTFs must be byte-identical with
--device_bridge on vs off.
"""

import os
import random
from types import SimpleNamespace

import numpy as np
import pytest

from aletsch_tpu.ops import bridge_topk
from aletsch_tpu.ops.bridge_topk import K, S, SENTINEL


def _random_instance(rng, V, E, T):
    """One padded batch row of a random tie-heavy DAG DP instance."""
    P = np.full((V, E), -1, dtype=np.int32)
    Wt = np.zeros((V, E), dtype=np.int32)
    Lv = rng.integers(1, 50, size=V).astype(np.int32)
    n = int(rng.integers(3, V + 1))
    Lv[n:] = 0
    for k in range(1, n):
        deg = int(rng.integers(0, min(k, E) + 1))
        preds = rng.choice(k, size=deg, replace=False)
        for c, j in enumerate(preds):
            P[k, c] = j
            Wt[k, c] = int(rng.integers(0, 3))    # tie-heavy
    tgt = np.full(T, -1, dtype=np.int32)
    nt = int(rng.integers(1, T + 1))
    tgt[:nt] = rng.integers(1, n, size=nt)
    return P, Wt, Lv, tgt


def test_kernel_matches_host_oracle():
    rng = np.random.default_rng(7)
    B, V, E, T = 8, 16, 4, 4
    rows = [_random_instance(rng, V, E, T) for _ in range(B)]
    P = np.stack([r[0] for r in rows])
    Wt = np.stack([r[1] for r in rows])
    Lv = np.stack([r[2] for r in rows])
    tgt = np.stack([r[3] for r in rows])
    fn = bridge_topk.get_bridge_fn(V, E, T)
    got = [np.asarray(x) for x in fn(P, Wt, Lv, tgt)]
    want = bridge_topk.bridge_dp_host(P, Wt, Lv, tgt)
    for g, w, name in zip(got, want, ("ostk", "par", "pix")):
        assert np.array_equal(g, w), name


def _backtrace(par, pix, v0, j):
    path = []
    p, q = v0, j
    while True:
        path.append(p)
        np_, nq = int(par[p, q]), int(pix[p, q])
        if np_ < 0:
            break
        p, q = np_, nq
    path.reverse()
    return path


def test_kernel_matches_solver_dp():
    """Entry-for-entry equality (stacks + traced paths, stable ties)
    against bridge/solver.py _dynamic_programming + _trace_back on random
    splice-graph windows with mixed-strand edges."""
    from aletsch_tpu.bridge.solver import BridgeSolver
    from aletsch_tpu.config import Parameters
    from aletsch_tpu.core.graph import SpliceGraph

    cfg = Parameters()
    assert cfg.bridge_dp_solution_size == K
    assert cfg.bridge_dp_stack_size == S
    V, E, T = 16, 4, 4
    fn = bridge_topk.get_bridge_fn(V, E, T)
    rnd = random.Random(11)
    for trial in range(40):
        n = rnd.randint(4, V)
        gr = SpliceGraph()
        for i in range(n):
            v = gr.add_vertex()
            vi = gr.get_vertex_info(v)
            vi.lpos = 100 * i
            vi.rpos = 100 * i + rnd.randint(1, 60)
        for s in range(n - 1):
            for t in range(s + 1, n):
                if rnd.random() < (0.9 if t == s + 1 else 0.25):
                    if gr.in_degree(t) >= E:
                        continue
                    e = gr.add_edge(s, t)
                    gr.set_edge_weight(e, rnd.choice(
                        [0.5, 1.0, 1.0, 2.0, 3.0, 999999.0]))
                    gr.get_edge_info(e).strand = rnd.choice([0, 0, 1, 2])
        k1 = rnd.randint(0, n - 2)
        k2 = rnd.randint(k1 + 1, n - 1)
        if k2 - k1 + 1 > V:
            continue
        strand = rnd.choice([1, 2])
        solver = SimpleNamespace(gr=gr, cfg=cfg)
        table = BridgeSolver._dynamic_programming(solver, k1, k2, strand)

        # export exactly like native/core_solve.h export_inst
        P = np.full((V, E), -1, dtype=np.int32)
        Wt = np.zeros((V, E), dtype=np.int32)
        Lv = np.zeros(V, dtype=np.int32)
        for k in range(k1, k2 + 1):
            lr = k - k1
            vi = gr.get_vertex_info(k)
            Lv[lr] = vi.rpos - vi.lpos
            if lr == 0:
                continue
            c = 0
            for e in gr.in_edges(k):
                st = gr.get_edge_info(e).strand
                if st != 0 and st != strand:
                    continue
                if e.s < k1:
                    continue
                w = min(int(gr.get_edge_weight(e)), SENTINEL)
                P[lr, c] = e.s - k1
                Wt[lr, c] = w
                c += 1
        tgts = sorted(rnd.sample(range(k1 + 1, k2 + 1),
                                 min(T, k2 - k1)))
        tgt = np.full(T, -1, dtype=np.int32)
        tgt[:len(tgts)] = [t - k1 for t in tgts]

        ostk, par, pix = (np.asarray(x) for x in
                          fn(P[None], Wt[None], Lv[None], tgt[None]))
        ostk, par, pix = ostk[0], par[0], pix[0]
        for ti, tv in enumerate(tgts):
            want = table[tv]
            paths = BridgeSolver._trace_back(solver, tv, table)
            got_n = int(np.sum(ostk[ti, :, 0] >= 0))
            assert got_n == len(want), (trial, tv)
            for j in range(got_n):
                assert ostk[ti, j].tolist() == list(want[j].stack)
                got_path = [p + k1 for p in
                            _backtrace(par, pix, tv - k1, j)]
                assert got_path == paths[j], (trial, tv, j)


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


def _run(tmp_path, lst, sub, device_bridge):
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
        p.device_bridge = device_bridge
    Incubator(params).resolve()
    files = {"meta.gtf": (out / "meta.gtf").read_bytes()}
    for f in sorted(os.listdir(out / "gtf")):
        files[f] = (out / "gtf" / f).read_bytes()
    return files


@pytest.mark.skipif(os.environ.get("ALETSCH_NATIVE_CORE") == "0",
                    reason="device bridging requires the native core")
def test_device_bridge_parity_and_engagement(tmp_path):
    """--device_bridge on must be byte-identical to the host path and must
    actually consume device results (a silently host-falling-back wiring
    would pass parity vacuously)."""
    from aletsch_tpu.meta import device_wave
    lst = _cohort(tmp_path)
    off = _run(tmp_path, lst, "off", "off")
    before = device_wave.stats["device_bridge_insts"]
    on = _run(tmp_path, lst, "on", "on")
    assert off == on
    assert device_wave.stats["device_bridge_insts"] > before, \
        "device bridging never engaged"
