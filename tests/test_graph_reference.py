"""Reference `.graph` fixture oracle for the decomposition ladder.

tests/fixtures/*.graph are written in the EXACT reference instance format
(splice_graph::build, rnacore/splice_graph.cc:329-376: vertex count, then
`name weight length` vertex lines, then `x y weight length` edge lines).
Each fixture is a flow-consistent DAG whose flow decomposition is UNIQUE,
so the expected source->sink path set is hand-derivable from the reference
algorithm semantics (every interior vertex is trivial or uniquely
balanced; scallop.cc resolve_trivial_vertex + the greedy tail must both
land on it) — a structural cross-check of the scallop ladder that is
independent of the in-repo simulator (VERDICT r1 task 7)."""

import os

from aletsch_tpu.config import Parameters
from aletsch_tpu.core.graph_io import read_graph_reference
from aletsch_tpu.scallop.decompose import Scallop
from aletsch_tpu.scallop.hyper_set import HyperSet

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

# fixture -> unique flow decomposition {(path vertices): weight}
EXPECTED = {
    # diamond: 10 units through 0-1-3-4, 5 units through 0-2-3-4; vertices
    # 1, 2 are in/out degree 1 and vertex 3 splits its single out-edge (15)
    # by its two in-edges (10, 5)
    "diamond.graph": {(0, 1, 3, 4): 10.0, (0, 2, 3, 4): 5.0},
    # skip: 7 units take the 1-2-3 chain, 5 units the 1->3 skip edge; the
    # only nontrivial vertex (3: in {7, 5}, out {12}) is again a trivial
    # split of its single out-edge
    "skip.graph": {(0, 1, 2, 3, 4, 5): 7.0, (0, 1, 3, 4, 5): 5.0},
}


def _stamp(gr):
    for e in gr.edges():
        ei = gr.get_edge_info(e)
        ei.samples = {0}
        ei.spAbd = {0: gr.get_edge_weight(e)}
        ei.abd = gr.get_edge_weight(e)
        ei.count = 1


def test_reference_format_parses_exactly():
    gr = read_graph_reference(os.path.join(FIXTURES, "diamond.graph"))
    assert gr.num_vertices() == 5
    assert gr.num_edges() == 5
    assert gr.get_vertex_weight(3) == 15.0
    e = gr.edge(1, 3)
    assert e is not None
    assert gr.get_edge_weight(e) == 10.0
    assert gr.get_edge_info(e).length == 100
    # positions synthesized for the decompose path (source/sink points)
    assert gr.get_vertex_info(0).lpos == gr.get_vertex_info(0).rpos
    assert gr.get_vertex_info(1).rpos == 200


def test_fixture_decompositions_match_hand_derivation():
    for name, want in EXPECTED.items():
        gr = read_graph_reference(os.path.join(FIXTURES, name))
        gr.chrm = "1"
        gr.gid = name
        gr.strand = "+"
        _stamp(gr)
        sc = Scallop(gr, HyperSet(), Parameters())
        sc.assemble()
        got = {tuple(p.v): p.weight for p in sc.paths}
        assert got == want, (name, got)


# ---------------------------------------------------------------- ladder
# 120 generated fixtures forcing each ladder arm (VERDICT r2 #4); see
# tools/gen_ladder_fixtures.py for the constructions and the derivations.

import json

import pytest

LADDER = os.path.join(FIXTURES, "ladder")


def _ladder_cases():
    exp_path = os.path.join(LADDER, "expected.json")
    if not os.path.exists(exp_path):
        return []
    with open(exp_path) as fh:
        return sorted(json.load(fh).items())


def _load_phases(name, hs):
    p = os.path.join(LADDER, name + ".phase")
    if not os.path.exists(p):
        return
    with open(p) as fh:
        for line in fh:
            parts = line.split()
            hs.add_node_list([int(v) for v in parts[1:]], int(parts[0]))


# ladder arm -> Scallop.arm_counts key that must fire (protected pins the
# OPPOSITE: smallest must NOT fire)
ARM_KEY = {"trivial": "trivial", "broken": "broken",
           "unsplittable": "unsplittable", "splittable": "splittable",
           "smallest": "smallest"}


@pytest.mark.parametrize("name,exp", _ladder_cases())
def test_ladder_fixture(name, exp):
    gr = read_graph_reference(os.path.join(LADDER, name + ".graph"))
    gr.chrm = "1"
    gr.gid = name
    gr.strand = "+"
    _stamp(gr)
    hs = HyperSet()
    _load_phases(name, hs)
    sc = Scallop(gr, hs, Parameters())
    sc.assemble()
    got = {tuple(p.v): p.weight for p in sc.paths}
    want = {tuple(int(v) for v in k.split(",")): w
            for k, w in exp["paths"].items()}
    arm = exp["arm"]
    assert set(got) == set(want), \
        "[arm=%s] path sets diverge: %s" % (arm, (sorted(got),
                                                  sorted(want)))
    if exp["exact"]:
        for p, w in want.items():
            assert got[p] == w, \
                "[arm=%s] weight of %s: got %r want %r" % (arm, p,
                                                           got[p], w)
    else:
        total = sum(got.values())
        assert abs(total - exp["total"]) <= exp["slack"] + 1.0, \
            "[arm=%s] weight conservation: sum %r vs %r (+-%r)" % (
                arm, total, exp["total"], exp["slack"])
    key = ARM_KEY.get(arm)
    if arm == "protected":
        assert sc.arm_counts["smallest"] == 0, \
            "[arm=protected] phasing-protected edge was removed"
    elif key:
        assert sc.arm_counts[key] >= 1, \
            "[arm=%s] expected ladder rung never fired: %r" % (
                arm, sc.arm_counts)
