"""Fuzz the decomposition on simulated flow-consistent graphs."""

import io
import random

import pytest

from aletsch_tpu.config import Parameters
from aletsch_tpu.core.graph_io import (read_graph_flat, simulate_graph,
                                       write_graph, write_graph_flat)
from aletsch_tpu.scallop.decompose import Scallop
from aletsch_tpu.scallop.hyper_set import HyperSet


def stamp(gr):
    for e in gr.edges():
        ei = gr.get_edge_info(e)
        ei.samples = {0}
        ei.spAbd = {0: gr.get_edge_weight(e)}
        ei.abd = gr.get_edge_weight(e)
        ei.count = 1


def random_phase_paths(gr, rng, n_paths=6):
    """Random walks source->sink become phasing paths."""
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


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_decomposition(seed):
    rng = random.Random(seed)
    nv = rng.randint(6, 24)
    ne = rng.randint(nv, 3 * nv)
    gr = simulate_graph(nv, ne, 100, seed=seed)
    if gr.num_edges() == 0:
        return
    gr.chrm = "1"
    gr.gid = "sim%d" % seed
    stamp(gr)
    gr_check = gr.copy()
    hs = random_phase_paths(gr, rng)
    hs.filter_nodes(gr)
    cfg = Parameters()
    sc = Scallop(gr, hs, cfg)
    trsts = sc.assemble()
    # invariants: every decomposed path is a valid path of the original graph
    for p in sc.paths:
        assert p.v[0] == 0
        assert p.v[-1] == gr_check.num_vertices() - 1
        for a, b in zip(p.v, p.v[1:]):
            assert gr_check.edge(a, b) is not None, (seed, p.v)
        assert p.weight > 0
    # transcripts have sane exon chains
    for t in trsts:
        for (a, b) in t.exons:
            assert a < b
        for k in range(1, len(t.exons)):
            assert t.exons[k - 1][1] <= t.exons[k][0]


def test_graph_flat_roundtrip():
    gr = simulate_graph(10, 15, 50, seed=1)
    buf = io.StringIO()
    write_graph_flat(gr, buf)
    buf.seek(0)
    g2 = read_graph_flat(buf)
    assert g2.num_vertices() == gr.num_vertices()
    assert g2.num_edges() == gr.num_edges()
    w1 = sorted((e.s, e.t, round(gr.get_edge_weight(e), 4)) for e in gr.edges())
    w2 = sorted((e.s, e.t, round(g2.get_edge_weight(e), 4)) for e in g2.edges())
    assert w1 == w2


def test_graph_summary_write():
    gr = simulate_graph(8, 12, 50, seed=2)
    gr.gid = "g"
    gr.chrm = "chr1"
    buf = io.StringIO()
    write_graph(gr, buf)
    s = buf.getvalue()
    assert s.startswith("# g chr1")
    assert "region" in s
