"""Tests for the auxiliary parity modules: draw, binomial, bridged BAM,
full revision pass, GTF writing."""

import pytest

from aletsch_tpu.config import Parameters
from aletsch_tpu.core.bridged_bam import (chain_to_cigar,
                                          write_bridged_pereads_cluster)
from aletsch_tpu.core.draw import draw_splice_graph
from aletsch_tpu.core.graph import SpliceGraph, VertexInfo
from aletsch_tpu.core.graph_reviser import (extend_boundaries,
                                            keep_surviving_edges,
                                            remove_intron_contamination,
                                            revise_splice_graph_full)
from aletsch_tpu.io.bam import BamReader, BamWriter, CREF_SKIP
from aletsch_tpu.io.gtf import Transcript, read_gtf, write_gtf
from aletsch_tpu.utils.stats import compute_binomial_pvalue


def simple_graph():
    gr = SpliceGraph()
    gr.add_vertex()
    gr.set_vertex_info(0, VertexInfo(lpos=0, rpos=0))
    for i, (l, r, w) in enumerate([(0, 100, 10.0), (200, 300, 9.0)]):
        gr.add_vertex()
        gr.set_vertex_info(i + 1, VertexInfo(lpos=l, rpos=r, length=r - l))
        gr.set_vertex_weight(i + 1, w)
    gr.add_vertex()
    gr.set_vertex_info(3, VertexInfo(lpos=300, rpos=300))
    for (s, t, w) in [(0, 1, 10), (1, 2, 9), (2, 3, 9)]:
        e = gr.add_edge(s, t)
        gr.set_edge_weight(e, w)
    return gr


def test_draw(tmp_path):
    gr = simple_graph()
    p = str(tmp_path / "g.tex")
    draw_splice_graph(gr, p)
    s = open(p).read()
    assert "tikzpicture" in s and s.count("\\node") == 4
    assert s.count("\\draw") == 3


def test_binomial_pvalue():
    assert compute_binomial_pvalue(10, 0.5, 0) == 1.0
    assert compute_binomial_pvalue(10, 0.5, 11) == 0.0
    p = compute_binomial_pvalue(100, 0.1, 20)
    assert 0.0 < p < 0.01


def test_chain_to_cigar():
    assert chain_to_cigar(100, [150, 250], 300) == [(0, 50), (3, 100), (0, 50)]
    assert chain_to_cigar(100, [90, 95], 300) is None


def test_bridged_bam_roundtrip(tmp_path):
    class H:
        def __init__(s):
            s.qname = "q1"
            s.flag = 0x1 | 0x40
            s.tid = 0
            s.pos = 1000
            s.rpos = 1100
            s.qual = 60
            s.xs = "+"
            s.nh = 1
            s.hi = -1
            s.mtid = 0
            s.mpos = 1300
            s.isize = 400

    class PC:
        pass

    pc = PC()
    h1 = H()
    h2 = H()
    h2.pos, h2.rpos = 1300, 1400
    pc.hits1 = [h1]
    pc.hits2 = [h2]
    p = str(tmp_path / "b.bam")
    w = BamWriter(p, ["chr1"], [100000])
    n = write_bridged_pereads_cluster(w, pc, [1100, 1300])
    w.close()
    assert n == 1
    r = BamReader(p)
    rec = r.read_rec()
    assert rec.pos == 1000 and rec.rpos == 1400
    assert rec.extract_splices() == [1100, 1300]
    r.close()


def test_full_revision_smoke():
    cfg = Parameters()
    gr = simple_graph()
    revise_splice_graph_full(gr, cfg)
    # strong simple chain survives intact
    assert gr.num_edges() == 3


def test_intron_contamination():
    gr = simple_graph()
    # insert a weak retained-intron vertex between 1 and 2, adjacent both ways
    gr2 = SpliceGraph()
    gr2.add_vertex()
    gr2.set_vertex_info(0, VertexInfo(lpos=0, rpos=0))
    specs = [(0, 100, 50.0), (100, 200, 1.5), (200, 300, 50.0)]
    for i, (l, r, w) in enumerate(specs):
        gr2.add_vertex()
        gr2.set_vertex_info(i + 1, VertexInfo(lpos=l, rpos=r, length=r - l))
        gr2.set_vertex_weight(i + 1, w)
    gr2.add_vertex()
    gr2.set_vertex_info(4, VertexInfo(lpos=300, rpos=300))
    for (s, t, w) in [(0, 1, 50), (1, 2, 1.5), (2, 3, 1.5), (1, 3, 48),
                      (3, 4, 50)]:
        e = gr2.add_edge(s, t)
        gr2.set_edge_weight(e, w)
    assert remove_intron_contamination(gr2, 2.0)
    assert gr2.degree(2) == 0


def test_write_gtf_roundtrip(tmp_path):
    t = Transcript(seqname="chr1", source="x", gene_id="g", transcript_id="t",
                   strand="+", coverage=1.0)
    t.add_exon(0, 100)
    t.add_exon(200, 300)
    p = str(tmp_path / "o.gtf")
    write_gtf(p, [t])
    back = read_gtf(p)
    assert back[0].exons == [(0, 100), (200, 300)]
