import pytest

from aletsch_tpu.constants import (END_BOUNDARY, LEFT_SPLICE, RIGHT_SPLICE,
                                   START_BOUNDARY)
from aletsch_tpu.core.graph import SpliceGraph
from aletsch_tpu.core.graph_builder import GraphBuilder
from aletsch_tpu.core.essential import (build_exon_coordinates_from_path,
                                        build_path_from_exon_coordinates)

from helpers import build_bundle, default_cfg, two_exon_recs


def build_two_exon_graph(with_pairs=False):
    recs = two_exon_recs(with_pairs=with_pairs)
    bb = build_bundle(recs)
    cfg = default_cfg()
    gr = SpliceGraph()
    gb = GraphBuilder(bb, cfg)
    gb.build(gr)
    gr.build_vertex_index()
    return bb, gr, gb


def test_junctions():
    recs = two_exon_recs()
    bb = build_bundle(recs)
    gb = GraphBuilder(bb, default_cfg())
    gb.build_junctions()
    assert len(gb.junctions) == 1
    jc = gb.junctions[0]
    assert (jc.lpos, jc.rpos) == (1100, 1300)
    assert jc.count == 10
    assert jc.strand == "+"


def test_two_exon_graph_structure():
    bb, gr, gb = build_two_exon_graph()
    # vertices: source, exon1, exon2, sink
    assert gr.num_vertices() == 4
    v1 = gr.get_vertex_info(1)
    v2 = gr.get_vertex_info(2)
    assert (v1.lpos, v1.rpos) == (1000, 1100)
    assert (v2.lpos, v2.rpos) == (1300, 1374)   # rpos = last exon-read end
    assert gr.edge(0, 1) is not None
    assert gr.edge(1, 2) is not None
    assert gr.edge(2, 3) is not None
    assert gr.num_edges() == 3
    # junction edge weight equals junction count
    e = gr.edge(1, 2)
    assert gr.get_edge_weight(e) == 10
    assert gr.get_edge_info(e).strand == 1


def test_vertex_weights_reflect_coverage():
    bb, gr, gb = build_two_exon_graph()
    w1 = gr.get_vertex_weight(1)
    # exon1 [1000,1100): 8 unspliced 60bp reads + 10 spliced left flanks
    total = 8 * 60 + sum(50 + i for i in range(10))
    assert w1 == pytest.approx(total / 100, rel=0.01)


def test_path_coordinate_roundtrip():
    bb, gr, gb = build_two_exon_graph()
    coords = build_exon_coordinates_from_path(gr, [0, 1, 2, 3])
    assert coords == [1000, 1100, 1300, 1374]
    ok, path = build_path_from_exon_coordinates(gr, coords)
    assert ok and path == [1, 2]


def test_maximum_path():
    bb, gr, gb = build_two_exon_graph()
    w, p = gr.compute_maximum_path_w()
    assert len(p) == 3
    assert w > 0


def test_fragment_pairing():
    recs = two_exon_recs(with_pairs=True)
    bb = build_bundle(recs)
    bb.build_fragments()
    assert len(bb.frgs) == 6
    for f in bb.frgs:
        h1, h2 = bb.hits[f[0]], bb.hits[f[1]]
        assert h1.qname == h2.qname
        assert f[2] == 0


def test_splices_list():
    recs = two_exon_recs()
    bb = build_bundle(recs)
    assert bb.splices == [1100, 1300]
