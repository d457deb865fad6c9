import math

from aletsch_tpu.bridge.solver import BridgeSolver
from aletsch_tpu.core.chain_set import PhaseSet
from aletsch_tpu.core.graph import SpliceGraph
from aletsch_tpu.core.graph_builder import GraphBuilder
from aletsch_tpu.core.graph_cluster import build_pereads_clusters
from aletsch_tpu.scallop.decompose import Scallop
from aletsch_tpu.scallop.hyper_set import HyperSet
from aletsch_tpu.scallop.subsetsum import SubsetSum

from helpers import build_bundle, default_cfg, make_rec, two_exon_recs


def stamp_sample(gr, sid=0):
    """Like assembler::assemble: every edge supported by its own sample."""
    for e in gr.edges():
        ei = gr.get_edge_info(e)
        ei.samples = {sid}
        ei.spAbd = {sid: gr.get_edge_weight(e)}
        ei.abd = gr.get_edge_weight(e)
        ei.count = 1


def assemble_bundle(recs, cfg=None):
    cfg = cfg or default_cfg()
    bb = build_bundle(recs)
    bb.build_fragments()
    gr = SpliceGraph()
    GraphBuilder(bb, cfg).build(gr)
    gr.build_vertex_index()
    vc = build_pereads_clusters(gr, bb, cfg.max_reads_partition_gap)
    bs = BridgeSolver(gr, vc, cfg, 80, 500)
    for k, pc in enumerate(vc):
        if bs.opt[k].type <= 0:
            continue
        bb.update_bridges(pc.frlist, bs.opt[k].chain, bs.opt[k].strand)
    # rebuild graph after bridging (bundle::bridge then assemble re-transforms)
    gr = SpliceGraph()
    GraphBuilder(bb, cfg).build(gr)
    gr.gid = "test.0"
    gr.build_vertex_index()
    stamp_sample(gr)
    ps = PhaseSet()
    bb.build_phase_set(ps, gr)
    hs = HyperSet(gr, ps)
    hs.filter_nodes(gr)
    sc = Scallop(gr, hs, cfg)
    return sc.assemble()


def test_two_exon_transcript():
    trsts = assemble_bundle(two_exon_recs(with_pairs=True))
    multi = [t for t in trsts if len(t.exons) >= 2]
    assert len(multi) == 1
    t = multi[0]
    assert len(t.exons) == 2
    assert t.exons[0] == (1000, 1100)
    assert t.exons[1][0] == 1300
    assert t.strand == "+"
    assert t.coverage > math.log(1 + 2.0)
    f = t.features
    assert f.num_vertices == 2
    assert f.uni_junc == 1
    assert f.seq_max_wt >= f.seq_min_wt > 0


def three_isoform_recs():
    """Three-exon gene with two isoforms: 1-2-3 and 1-3 (exon skipping).

    exon1 [1000,1100), exon2 [2000,2100), exon3 [3000,3100).
    """
    recs = []
    # isoform A: junctions (1100,2000) and (2100,3000), abundant
    for i in range(20):
        recs.append(make_rec("a%d" % i, 1050 - i, "%dM900N50M" % (50 + i), xs="+"))
        recs.append(make_rec("b%d" % i, 2050 - i, "%dM900N50M" % (50 + i), xs="+"))
    # isoform B: junction (1100,3000), rarer
    for i in range(8):
        recs.append(make_rec("c%d" % i, 1049 - 2 * i, "%dM1900N50M" % (51 + 2 * i), xs="+"))
    # body coverage on all three exons
    for i in range(10):
        recs.append(make_rec("x%d" % i, 1001 + 7 * i, "30M", xs="."))
        recs.append(make_rec("y%d" % i, 2001 + 7 * i, "30M", xs="."))
        recs.append(make_rec("z%d" % i, 3001 + 7 * i, "30M", xs="."))
    # phasing: paired reads linking exon1-exon2 and exon2-exon3 via isoform A
    return recs


def test_exon_skipping_two_isoforms():
    trsts = assemble_bundle(three_isoform_recs())
    multi = sorted((t for t in trsts if len(t.exons) >= 2),
                   key=lambda t: -len(t.exons))
    assert len(multi) >= 2
    chains = {tuple(t.get_intron_chain()) for t in multi}
    assert ((1100, 2000), (2100, 3000)) in chains
    assert ((1100, 3000),) in chains


def test_subsetsum():
    ss = SubsetSum([(10, 1), (20, 2), (39, 3)], [(29, 4), (54, 5)])
    eqn = ss.solve()
    # best split: {10,20} vs {29}: diff 1
    assert eqn.e >= 0
    got = (sorted(eqn.s), sorted(eqn.t))
    assert got == ([1, 2], [4]) or got == ([3], [4]) or eqn.e < 0.1


def test_single_path_graph_trivial():
    # single-exon-free: 10 spliced reads only, no pairing
    trsts = assemble_bundle(two_exon_recs(n_exon=4, with_pairs=False))
    multi = [t for t in trsts if len(t.exons) >= 2]
    assert len(multi) == 1
