"""Fuzz the dense ladder reference machine (ops/ladder_ref.py) against the
Python Scallop's own arms, decision for decision and bit for bit.

The device scallop-ladder path consumes the machine's decision log in
trust mode, so this equivalence IS the byte-parity argument (same model
as ops/greedy_fused.py): identical decisions + identical replay = the
identical graph the unmodified ladder would produce.
"""

import math
import random

import pytest

from aletsch_tpu.config import Parameters
from aletsch_tpu.constants import SMALLEST_EDGE, TRIVIAL_VERTEX
from aletsch_tpu.core.graph_io import simulate_graph
from aletsch_tpu.ops import ladder_ref
from aletsch_tpu.ops.ladder_ref import (BROKEN, SMALLEST, ST_CLEAN, TRIVIAL,
                                        export_scallop, run_ladder)
from aletsch_tpu.scallop.decompose import Scallop
from aletsch_tpu.scallop.hyper_set import HyperSet


class LoggingScallop(Scallop):
    def __init__(self, gr, hs, cfg):
        super().__init__(gr, hs, cfg)
        self.declog = []
        self._in_smallest = False

    def resolve_broken_vertex(self):
        for i in sorted(self.nonzeroset):
            if self.gr.in_degree(i) >= 1 and self.gr.out_degree(i) >= 1:
                continue
            self.declog.append((BROKEN, i))
            break
        return super().resolve_broken_vertex()

    def decompose_trivial_vertex(self, x):
        self.declog.append((TRIVIAL, x))
        super().decompose_trivial_vertex(x)

    def resolve_smallest_edges(self, max_ratio):
        self._in_smallest = True
        try:
            return super().resolve_smallest_edges(max_ratio)
        finally:
            self._in_smallest = False

    def remove_edge(self, e):
        if self._in_smallest:
            self.declog.append((SMALLEST, e))
        super().remove_edge(e)


def run_restricted(sc):
    """The ladder with only the device-covered arms (the prefix the device
    machine executes; scallop.cc:47-150 rungs 1-4)."""
    r = sc.cfg.max_decompose_error_ratio
    while True:
        if sc.gr.num_vertices() > sc.cfg.max_num_exons:
            break
        if sc.resolve_broken_vertex():
            continue
        if sc.resolve_trivial_vertex_fast(r[TRIVIAL_VERTEX]):
            continue
        if sc.resolve_trivial_vertex(1, True, r[TRIVIAL_VERTEX]):
            continue
        if sc.resolve_smallest_edges(r[SMALLEST_EDGE]):
            continue
        break


def stamp(gr, rng=None):
    for e in gr.edges():
        ei = gr.get_edge_info(e)
        ei.samples = {0}
        ei.spAbd = {0: gr.get_edge_weight(e)}
        ei.abd = gr.get_edge_weight(e)
        ei.count = 1
        if rng is not None:
            ei.strand = rng.choice([0, 0, 0, 1, 2])


def random_phase_paths(gr, rng, n_paths):
    hs = HyperSet()
    n = gr.num_vertices() - 1
    for _ in range(n_paths):
        v = 0
        path = []
        while v != n:
            outs = gr.out_edges(v)
            if not outs:
                break
            e = rng.choice(outs)
            v = e.t
            if v != n:
                path.append(v)
        if len(path) >= 2:
            hs.add_node_list(path, rng.randint(2, 10))
    return hs


def make_scallop(seed, cls=Scallop):
    rng = random.Random(seed)
    nv = rng.randint(6, 24)
    ne = rng.randint(nv, 3 * nv)
    gr = simulate_graph(nv, ne, 100, seed=seed)
    if gr.num_edges() == 0:
        return None
    stamp(gr, rng if seed % 3 == 0 else None)
    hs = random_phase_paths(gr, rng, rng.randint(0, 8))
    hs.filter_nodes(gr)
    cfg = Parameters()
    return cls(gr, hs, cfg)


def compare_states(sc, st):
    """Dense state == host Scallop, index for index and bit for bit."""
    assert st.n_edges == len(sc.i2e)
    for i, ee in enumerate(sc.i2e):
        if ee is None:
            assert not st.e_alive[i], i
            continue
        assert st.e_alive[i], i
        assert int(st.e_src[i]) == ee.s and int(st.e_dst[i]) == ee.t, i
        hw = sc.gr.get_edge_weight(ee)
        assert math.isclose(float(st.e_wrt[i]), hw, rel_tol=0, abs_tol=0) \
            or float(st.e_wrt[i]) == hw, (i, float(st.e_wrt[i]), hw)
        assert float(st.e_wrt[i]) == hw, (i, float(st.e_wrt[i]), hw)
        assert int(st.e_str[i]) == sc.gr.get_edge_info(ee).strand, i
    assert st.n_hyper == len(sc.hs.edges)
    for k, vv in enumerate(sc.hs.edges):
        assert int(st.h_len[k]) == len(vv), k
        assert list(st.h_edge[k, :len(vv)]) == list(vv), k
    nz = set(i for i in range(1, st.nv - 1) if st.nonzero[i])
    assert nz == sc.nonzeroset


@pytest.mark.parametrize("seed", range(60))
def test_ladder_ref_matches_python_scallop(seed):
    host = make_scallop(seed, LoggingScallop)
    if host is None:
        return
    dense = make_scallop(seed)       # identical twin for the dense export
    st = export_scallop(dense)
    if st is None:
        pytest.skip("ineligible graph (caps)")
    run_restricted(host)
    decisions, status = run_ladder(st)
    assert status == ST_CLEAN
    assert decisions == host.declog, (seed, decisions, host.declog)
    compare_states(host, st)


def test_ladder_overflow_status():
    host = make_scallop(2)
    st = export_scallop(host)
    assert st is not None
    decisions, status = run_ladder(st, max_decisions=0)
    if decisions:
        assert status == ladder_ref.ST_OVERFLOW
