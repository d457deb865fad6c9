"""Structural fuzzes for the algorithmic cores (out-of-CI scale).

Random flow-consistent DAGs through: (a) the graph-revision family under
shuffled pass orders, (b) scallop decomposition (path-validity invariants),
(c) the bridge solver (synthetic clusters, chain monotonicity).  These are
the harnesses that caught the keep_surviving_edges NoneType crash; run with
a seed count argument (default 200 per component).

    python tools/fuzz_structural.py [n_seeds]
"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
import jax

jax.config.update("jax_platforms", "cpu")

from aletsch_tpu.config import Parameters
from aletsch_tpu.core.graph_io import simulate_graph


def fuzz_reviser(n):
    from test_reviser_fuzz import PASSES, check_invariants
    bad = 0
    for seed in range(n):
        cfg = Parameters()
        rng = random.Random(seed)
        nv = rng.randint(5, 30)
        gr = simulate_graph(nv, rng.randint(nv, 3 * nv), 60, seed=seed)
        gr.strand = rng.choice("+-.")
        gr.chrm = "chr1"
        gr.build_vertex_index()
        order = list(range(len(PASSES)))
        rng.shuffle(order)
        try:
            for k in order:
                PASSES[k](gr, cfg)
                gr.build_vertex_index()
                check_invariants(gr)
        except Exception as e:
            bad += 1
            print("reviser seed %d FAILED: %r" % (seed, e))
    return bad


def fuzz_scallop(n):
    from test_scallop_fuzz import random_phase_paths, stamp
    from aletsch_tpu.scallop.decompose import Scallop
    bad = 0
    for seed in range(n):
        rng = random.Random(seed)
        nv = rng.randint(6, 40)
        gr = simulate_graph(nv, rng.randint(nv, 3 * nv), 100, seed=seed)
        if gr.num_edges() == 0:
            continue
        gr.chrm = "1"
        gr.gid = "sim%d" % seed
        stamp(gr)
        gr_check = gr.copy()
        hs = random_phase_paths(gr, rng)
        hs.filter_nodes(gr)
        try:
            sc = Scallop(gr, hs, Parameters())
            sc.assemble()
            for p in sc.paths:
                assert p.v[0] == 0 and p.v[-1] == gr_check.num_vertices() - 1
                for a, b in zip(p.v, p.v[1:]):
                    assert gr_check.edge(a, b) is not None
                assert p.weight > 0
        except Exception as e:
            bad += 1
            print("scallop seed %d FAILED: %r" % (seed, e))
    return bad


def fuzz_bridge(n):
    from aletsch_tpu.bridge.solver import BridgeSolver
    from aletsch_tpu.core.graph_cluster import PereadsCluster
    bad = 0
    for seed in range(n):
        rng = random.Random(seed)
        nv = rng.randint(5, 30)
        gr = simulate_graph(nv, rng.randint(nv, 3 * nv), 60, seed=seed)
        gr.chrm = "chr1"
        gr.strand = rng.choice("+-.")
        gr.build_vertex_index()
        vc = []
        if nv > 2:
            lo = gr.get_vertex_info(1).lpos
            hi = gr.get_vertex_info(nv - 2).rpos
        else:
            lo, hi = 0, 100
        for _ in range(rng.randint(0, 12)):
            pc = PereadsCluster()
            a = rng.randint(lo, max(lo, hi - 4))
            b = min(hi, a + rng.randint(1, 80))
            c = rng.randint(a, hi)
            d = min(hi, c + rng.randint(1, 80))
            pc.bounds = [a, b, c, d]
            pc.extend = [a, b, c, d]
            pc.count = rng.randint(1, 5)
            vc.append(pc)
        try:
            bs = BridgeSolver(gr, vc, Parameters(), 80, 500)
            assert len(bs.opt) == len(vc)
            for bbp in bs.opt:
                if bbp.type >= 1 and bbp.whole:
                    prev = -1
                    for x in bbp.whole:
                        assert x >= prev
                        prev = x
        except Exception as e:
            bad += 1
            print("bridge seed %d FAILED: %r" % (seed, e))
    return bad


def fuzz_subsetsum(n):
    """In-contract fuzz (callers guarantee >=2 items per side,
    router.py:304 / router.cc:457; below that both implementations assert,
    subsetsum.cc:190)."""
    from aletsch_tpu.scallop.subsetsum import SubsetSum
    bad = 0
    for seed in range(n):
        rng = random.Random(seed)
        ns, nt = rng.randint(2, 7), rng.randint(2, 7)
        source = [[rng.randint(1, 500), i] for i in range(ns)]
        target = [[rng.randint(1, 500), i] for i in range(nt)]
        try:
            eqn = SubsetSum(source, target).solve()
            assert eqn.e >= 0 and eqn.s and eqn.t
            sids = {x[1] for x in source}
            tids = {x[1] for x in target}
            assert all(i in sids for i in eqn.s)
            assert all(i in tids for i in eqn.t)
        except Exception as e:
            bad += 1
            print("subsetsum seed %d FAILED: %r" % (seed, e))
    return bad


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    bad = (fuzz_reviser(n) + fuzz_scallop(n) + fuzz_bridge(n)
           + fuzz_subsetsum(n))
    print("structural fuzz x%d per component: %d failures" % (n, bad))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
