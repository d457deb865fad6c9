"""Fuzz the graph-revision family: random flow-consistent DAGs through every
revision pass must preserve graph invariants (valid indices, non-negative
weights, monotone positional order, intact source/sink reachability)."""

import random

import pytest

from aletsch_tpu.config import Parameters
from aletsch_tpu.core.graph_io import simulate_graph
from aletsch_tpu.core.graph_reviser import (extend_boundaries,
                                            group_end_boundaries,
                                            group_start_boundaries,
                                            identify_boundaries,
                                            keep_surviving_edges,
                                            remove_inner_boundaries,
                                            remove_intron_contamination,
                                            remove_small_exons,
                                            remove_small_junctions)


def check_invariants(gr):
    n = gr.num_vertices()
    assert n >= 2
    for e in gr.edges():
        assert 0 <= e.s < n and 0 <= e.t < n
        assert e.s < e.t, "forward-only edges"
        assert gr.get_edge_weight(e) >= 0
    # interior vertices positionally ordered
    prev = None
    for i in range(1, n - 1):
        vi = gr.get_vertex_info(i)
        assert vi.lpos <= vi.rpos
        if prev is not None:
            assert vi.lpos >= prev
        prev = vi.lpos


PASSES = [
    lambda gr, cfg: extend_boundaries(gr),
    lambda gr, cfg: remove_small_exons(gr, cfg.min_exon_length),
    lambda gr, cfg: remove_small_junctions(gr),
    lambda gr, cfg: remove_inner_boundaries(gr),
    lambda gr, cfg: remove_intron_contamination(
        gr, cfg.max_intron_contamination_coverage),
    lambda gr, cfg: keep_surviving_edges(gr, cfg.min_surviving_edge_weight),
    lambda gr, cfg: identify_boundaries(gr, cfg),
    # remove_false_boundaries needs live bundle state; covered by e2e tests
    lambda gr, cfg: group_start_boundaries(gr, cfg.max_group_boundary_distance),
    lambda gr, cfg: group_end_boundaries(gr, cfg.max_group_boundary_distance),
]


@pytest.mark.parametrize("seed", range(40))
def test_revision_family_invariants(seed):
    cfg = Parameters()
    rng = random.Random(seed)
    nv = rng.randint(5, 24)
    ne = rng.randint(nv, 3 * nv)
    gr = simulate_graph(nv, ne, 60, seed=seed)
    gr.strand = rng.choice("+-.")
    gr.chrm = "chr1"
    gr.build_vertex_index()
    order = list(range(len(PASSES)))
    rng.shuffle(order)
    for k in order:
        try:
            PASSES[k](gr, cfg)
        except AssertionError:
            raise
        gr.build_vertex_index()
        check_invariants(gr)
