from aletsch_tpu.bridge.solver import BridgeSolver, _update_stack
from aletsch_tpu.core.chain_set import PhaseSet
from aletsch_tpu.core.graph import SpliceGraph
from aletsch_tpu.core.graph_builder import GraphBuilder
from aletsch_tpu.core.graph_cluster import build_pereads_clusters

from helpers import build_bundle, default_cfg, two_exon_recs


def test_update_stack():
    s = [999999] * 5
    s = _update_stack(s, 10)
    assert s == [10, 999999, 999999, 999999, 999999]
    s = _update_stack(s, 20)
    assert s == [10, 20, 999999, 999999, 999999]
    s = _update_stack(s, 5)
    assert s == [5, 10, 20, 999999, 999999]
    s = _update_stack(s, 10 ** 7)   # larger than all -> dropped
    assert s == [5, 10, 20, 999999, 999999]


def bridge_two_exon():
    cfg = default_cfg()
    bb = build_bundle(two_exon_recs(with_pairs=True))
    bb.build_fragments()
    gr = SpliceGraph()
    GraphBuilder(bb, cfg).build(gr)
    gr.build_vertex_index()
    vc = build_pereads_clusters(gr, bb, cfg.max_reads_partition_gap)
    bs = BridgeSolver(gr, vc, cfg, 80, 500)
    return bb, gr, vc, bs


def test_bridge_two_exon_pairs():
    bb, gr, vc, bs = bridge_two_exon()
    assert len(vc) >= 1
    bridged = [o for o in bs.opt if o.type >= 0]
    assert len(bridged) == len(vc)
    for o in bridged:
        assert o.type == 2
        assert o.chain == [1100, 1300]
        assert o.strand == 1


def test_update_bridges_and_phase_set():
    bb, gr, vc, bs = bridge_two_exon()
    cnt = 0
    for k, pc in enumerate(vc):
        if bs.opt[k].type <= 0:
            continue
        cnt += bb.update_bridges(pc.frlist, bs.opt[k].chain, bs.opt[k].strand)
    assert cnt == 6
    assert all(f[2] == 2 for f in bb.frgs)

    ps = PhaseSet()
    bb.build_phase_set(ps, gr)
    # bridged pairs phase through the junction
    assert any(len(k) == 4 and k[1] == 1100 and k[2] == 1300
               for k in ps.pmap)
    # spliced single reads phase through the junction too
    total = sum(c for k, c in ps.pmap.items() if 1100 in k and 1300 in k)
    assert total >= 16   # 10 spliced singles + 6 bridged pairs


def test_adjacent_edges_restored():
    bb, gr, vc, bs = bridge_two_exon()
    # temporary adjacent edges must be removed after solving
    for e in gr.edges():
        assert abs(gr.get_edge_weight(e) - 0.5) > 1e-9
