import numpy as np
import pytest

from aletsch_tpu.ops.bridge_dp import (bottleneck_all_sources_host,
                                       dense_adjacency, get_bottleneck_fn,
                                       NEG, POS)
from aletsch_tpu.ops.coverage import get_region_stats_fn, region_stats_host
from aletsch_tpu.parallel.mesh import (build_sharded_step, example_batch,
                                       make_mesh)


def test_bottleneck_host_vs_jax():
    rng = np.random.default_rng(0)
    W = np.triu(rng.uniform(0, 10, size=(4, 12, 12)).astype(np.float32), k=1)
    W *= (rng.uniform(size=W.shape) < 0.4)
    T1 = bottleneck_all_sources_host(W)
    T2 = np.asarray(get_bottleneck_fn()(W))
    assert np.allclose(T1, T2, rtol=1e-5)


def test_bottleneck_matches_graph_dp():
    """Kernel agrees with the sequential splice-graph max-path DP."""
    from helpers import build_bundle, default_cfg, two_exon_recs
    from aletsch_tpu.core.graph import SpliceGraph
    from aletsch_tpu.core.graph_builder import GraphBuilder
    bb = build_bundle(two_exon_recs())
    gr = SpliceGraph()
    GraphBuilder(bb, default_cfg()).build(gr)
    W = dense_adjacency(gr)[None, :, :]
    T = bottleneck_all_sources_host(W)
    w, p = gr.compute_maximum_path_w()
    assert T[0, 0, gr.num_vertices() - 1] == pytest.approx(w)


def test_region_stats_match_coverage_map():
    from aletsch_tpu.utils.intervals import CoverageMap
    m = CoverageMap()
    m.add(0, 10, 2)
    m.add(20, 30, 4)
    l, r, v = m.contained(0, 30)
    S = 8
    vals = np.zeros((1, S))
    lens = np.zeros((1, S))
    mask = np.zeros((1, S))
    vals[0, :len(v)] = v
    lens[0, :len(v)] = (r - l)
    mask[0, :len(v)] = 1
    ave, dev, mx = region_stats_host(vals, lens, mask, np.array([30.0]))
    a2, d2, m2 = m.evaluate_rectangle(0, 30)
    assert ave[0] == pytest.approx(a2)
    assert dev[0] == pytest.approx(d2)
    assert mx[0] == pytest.approx(m2)
    fn = get_region_stats_fn()
    aj, dj, mj = fn(vals, lens, mask, np.array([30.0]))
    assert float(aj[0]) == pytest.approx(a2)


def test_sharded_step_8dev():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    fn = build_sharded_step(mesh)
    args = example_batch(B=16, V=16, S=8, P_=32, Ns=2, J=8)
    out = fn(*args)
    bottleneck, ave, dev, mx, sim, support = [np.asarray(o) for o in out]
    assert bottleneck.shape == (16,)
    assert sim.shape == (16, 16)
    assert support.shape == (16, 8)
    # support is the sample-axis sum
    assert np.allclose(support, args[6].sum(axis=0), rtol=1e-5)
    # similarity matmul matches host
    assert np.allclose(sim, args[5] @ args[5].T, rtol=1e-5)


def test_graft_entry():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = fn(*args)
    assert len(out) == 6
    mod.dryrun_multichip(8)


def test_bottleneck_vs_exhaustive_paths():
    """Pin the max-min semiring DP against brute-force path enumeration on
    tiny random DAGs (all-sources, all-targets)."""
    import itertools
    import numpy as np
    from aletsch_tpu.ops.bridge_dp import (NEG, POS,
                                           bottleneck_all_sources_host)

    rng = np.random.default_rng(123)
    for trial in range(25):
        V = int(rng.integers(3, 7))
        W = np.triu(rng.uniform(1, 9, (1, V, V)).astype(np.float32), 1)
        W *= (rng.uniform(size=W.shape) < 0.6)
        got = bottleneck_all_sources_host(W)[0]

        def paths(s, t):
            if s == t:
                yield []
                return
            for m in range(s + 1, t + 1):
                if W[0, s, m] > 0:
                    for rest in paths(m, t):
                        yield [(s, m)] + rest

        for s in range(V):
            for t in range(V):
                if s == t:
                    continue
                best = None
                for pth in paths(s, t):
                    if not pth:
                        continue
                    bn = min(W[0, a, b] for a, b in pth)
                    best = bn if best is None else max(best, bn)
                g = float(got[s, t])
                if best is None:
                    assert g <= NEG / 2 or g == 0 or g <= 0, (s, t, g)
                else:
                    assert abs(g - best) < 1e-4, (trial, s, t, g, best)
