"""Unit tests for revision passes, filters, transcript merging, clustering,
profiles, and protocol overlays."""

import math

import pytest

from aletsch_tpu.config import Parameters, parse_arguments
from aletsch_tpu.constants import (ONT, PACBIO_CCS, PACBIO_SUB, PAIRED_END,
                                   TRANSCRIPT_COUNT_ADD_COVERAGE_ADD)
from aletsch_tpu.core.filters import (join_single_exon_transcripts,
                                      remove_nested_transcripts,
                                      verify_exon_length,
                                      verify_length_coverage)
from aletsch_tpu.core.graph import SpliceGraph, VertexInfo
from aletsch_tpu.core.graph_reviser import (group_end_boundaries,
                                            group_start_boundaries,
                                            identify_boundaries)
from aletsch_tpu.core.transcript_set import TranscriptSet
from aletsch_tpu.io.gtf import Transcript
from aletsch_tpu.meta.sample_profile import SampleProfile


def chain_graph(weights, positions):
    """Linear graph 0 -> 1..n -> sink with given vertex intervals."""
    gr = SpliceGraph()
    gr.add_vertex()
    gr.set_vertex_info(0, VertexInfo(lpos=positions[0][0], rpos=positions[0][0]))
    for i, ((l, r), w) in enumerate(zip(positions, weights)):
        gr.add_vertex()
        gr.set_vertex_info(i + 1, VertexInfo(lpos=l, rpos=r, length=r - l))
        gr.set_vertex_weight(i + 1, w)
    gr.add_vertex()
    n = gr.num_vertices() - 1
    gr.set_vertex_info(n, VertexInfo(lpos=positions[-1][1], rpos=positions[-1][1]))
    return gr


class TestGroupBoundaries:
    def test_group_start(self):
        # two nearby start boundaries along a continuous run
        gr = chain_graph([10, 8, 9], [(0, 100), (100, 200), (200, 300)])
        n = gr.num_vertices() - 1
        for i in range(1, n):
            e = gr.add_edge(i, i + 1) if i + 1 < n else None
            if e is not None:
                gr.set_edge_weight(e, 5)
        e1 = gr.add_edge(0, 1)
        gr.set_edge_weight(e1, 10)
        e2 = gr.add_edge(0, 2)
        gr.set_edge_weight(e2, 4)
        e3 = gr.add_edge(n - 1, n)
        gr.set_edge_weight(e3, 9)
        smap = group_start_boundaries(gr, 10000)
        # boundary at vertex 2 (lpos 100) folded into vertex 1 (lpos 0)
        assert smap == {100: 0}
        assert gr.edge(0, 2) is None
        assert gr.get_edge_weight(gr.edge(0, 1)) == 14
        # run edge and vertex weights absorbed the merged weight
        assert gr.get_edge_weight(gr.edge(1, 2)) == 9
        assert gr.get_vertex_weight(1) == 14

    def test_identify_boundaries(self):
        cfg = Parameters()
        # strong coverage jump at non-adjacent vertex 2 with weak junction in
        gr = chain_graph([1.0, 100.0], [(0, 100), (500, 600)])
        n = gr.num_vertices() - 1
        e = gr.add_edge(0, 1)
        gr.set_edge_weight(e, 1.0)
        e = gr.add_edge(1, 2)
        gr.set_edge_weight(e, 1.0)
        e = gr.add_edge(2, n)
        gr.set_edge_weight(e, 100.0)
        identify_boundaries(gr, cfg)
        # log(2+100)/log(2+1) > 2.0 -> new start edge at vertex 2
        assert gr.edge(0, 2) is not None


class TestFilters:
    def mk(self, exons, cov=5.0, strand="+"):
        t = Transcript(seqname="chr1", strand=strand, coverage=cov)
        for a, b in exons:
            t.add_exon(a, b)
        return t

    def test_verify_length_coverage(self):
        cfg = Parameters()
        t = self.mk([(0, 50), (100, 160)], cov=5)
        assert verify_length_coverage(t, cfg) is False  # 110 < 100+2*20
        t2 = self.mk([(0, 100), (200, 300)], cov=5)
        assert verify_length_coverage(t2, cfg) is True
        t3 = self.mk([(0, 100), (200, 300)], cov=1.0)
        assert verify_length_coverage(t3, cfg) is False
        t4 = self.mk([(0, 200)], cov=10)  # single exon, length 200 < 250
        assert verify_length_coverage(t4, cfg) is False

    def test_verify_exon_length(self):
        cfg = Parameters()
        assert verify_exon_length(self.mk([(0, 100), (105, 113)]), cfg)
        assert not verify_exon_length(self.mk([(0, 100), (105, 112)]), cfg)

    def test_remove_nested(self):
        big = self.mk([(0, 100), (1000, 1100)], cov=2)
        nested = self.mk([(300, 400), (500, 600)], cov=9)
        out = remove_nested_transcripts([big, nested])
        assert len(out) == 1
        assert out[0] is nested

    def test_join_single_exon(self):
        cfg = Parameters()
        multi = self.mk([(0, 100), (200, 300)], cov=5)
        single = self.mk([(350, 500)], cov=5)
        out = join_single_exon_transcripts([multi, single], cfg)
        assert len(out) == 1
        assert out[0].exons[-1] == (200, 500)


class TestTranscriptSet:
    def mk(self, exons, cov, tid):
        t = Transcript(seqname="chr1", strand="+", coverage=cov,
                       transcript_id=tid, cov2=cov)
        for a, b in exons:
            t.add_exon(a, b)
        return t

    def test_multi_exon_merge_adds_coverage(self):
        ts = TranscriptSet("chr1", 0, 0.8)
        # same intron chain (first-exon end + last-exon start match)
        t1 = self.mk([(0, 100), (200, 300)], 2.0, "a")
        t2 = self.mk([(10, 100), (200, 290)], 3.0, "b")
        ts.add_transcript(t1, 1, 0, TRANSCRIPT_COUNT_ADD_COVERAGE_ADD)
        ts.add_transcript(t2, 1, 1, TRANSCRIPT_COUNT_ADD_COVERAGE_ADD)
        out = ts.get_transcripts()
        assert len(out) == 1
        t = out[0]
        assert t.coverage == pytest.approx(5.0)
        assert t.count2 == 2
        # bounds extended to the widest observed
        assert t.exons[0][0] == 0 and t.exons[-1][1] == 300
        assert t.exons[0][1] == 100 and t.exons[-1][0] == 200

    def test_single_exon_overlap_merge(self):
        ts = TranscriptSet("chr1", 0, 0.8)
        t1 = self.mk([(0, 100)], 2.0, "a")
        t2 = self.mk([(5, 100)], 9.0, "b")
        h1 = t1.get_intron_chain_hashing()
        h2 = t2.get_intron_chain_hashing()
        assert h1 == h2  # same coarse bucket
        ts.add_transcript(t1, 1, 0, TRANSCRIPT_COUNT_ADD_COVERAGE_ADD)
        ts.add_transcript(t2, 1, 1, TRANSCRIPT_COUNT_ADD_COVERAGE_ADD)
        out = ts.get_transcripts()
        assert len(out) == 1
        # single-exon: coverage is max, not sum
        assert out[0].coverage == pytest.approx(9.0)


class TestConfig:
    def test_protocol_overlays(self):
        for dt, hits, junc in ((PACBIO_CCS, 1, 1), (PACBIO_SUB, 1, 2),
                               (ONT, 1, 2)):
            p = Parameters().set_default(dt)
            assert p.min_num_hits_in_bundle == hits
            assert p.min_junction_support == junc
        p = Parameters().set_default(PAIRED_END)
        assert p.min_num_hits_in_bundle == 10

    def test_typed_flag_targets_one_type(self):
        argv = ["--min_bundle_gap", "3", "150"]
        p_pe = parse_arguments(argv, PAIRED_END)
        p_cc = parse_arguments(argv, PACBIO_CCS)
        assert p_pe.min_bundle_gap == 200
        assert p_cc.min_bundle_gap == 150

    def test_generic_flags(self):
        p = parse_arguments(["-s", "0.4", "-c", "50",
                             "--max_decompose_error_ratio2", "0.9"],
                            PAIRED_END)
        assert p.min_grouping_similarity == 0.4
        assert p.max_group_size == 50
        assert p.max_decompose_error_ratio[2] == 0.9


def test_profile_roundtrip(tmp_path):
    sp = SampleProfile(3, 1000000)
    sp.data_type = PAIRED_END
    sp.library_type = 1
    sp.bam_with_xs = 1
    sp.insertsize_low = 77
    sp.insertsize_high = 432
    sp.insertsize_median = 250
    sp.insertsize_ave = 251.5
    sp.insertsize_std = 40.25
    sp.save_profile(str(tmp_path))
    sp2 = SampleProfile(3, 1000000)
    sp2.data_type = PAIRED_END
    assert sp2.load_profile(str(tmp_path))
    for f in ("library_type", "bam_with_xs", "insertsize_low",
              "insertsize_high", "insertsize_median"):
        assert getattr(sp, f) == getattr(sp2, f)
    assert sp2.insertsize_ave == pytest.approx(251.5)


def test_bundle_group_clustering():
    from aletsch_tpu.meta.bundle_group import BundleGroup

    class FakeSP:
        sample_id = 0

    class FakeBundle:
        def __init__(self, splices):
            self.splices = splices
            self.sp = FakeSP()
            self.rpos = 10 ** 9

    cfg = Parameters()
    g = BundleGroup("chr1", "+", 0, cfg, {})
    # A and B share most splices; C is unrelated
    g.gset = [FakeBundle([100, 200, 300, 400]),
              FakeBundle([100, 200, 300, 500]),
              FakeBundle([9000, 9100])]
    g.resolve()
    sets = sorted(tuple(sorted(v)) for v in g.gvv)
    assert (0, 1) in sets
    assert (2,) in sets


def test_partition_vectorized_matches_recursive():
    """_build_group_clusters (lexsort rounds) must reproduce the recursive
    _partition DFS exactly: same clusters, same member order."""
    import random
    from aletsch_tpu.core.graph_cluster import _partition

    rng = random.Random(99)
    import numpy as np
    for trial in range(200):
        n = rng.randint(1, 40)
        gap = rng.randint(1, 5)
        rows = [[rng.randint(0, 12), rng.randint(0, 12),
                 rng.randint(0, 12), rng.randint(0, 12), i]
                for i in range(n)]
        want = _partition([list(r) for r in rows], 0, gap)
        # replicate the vectorized rounds standalone
        pts = np.array([r[:4] for r in rows], dtype=np.int64)
        gid = np.zeros(n, dtype=np.int64)
        rank = np.arange(n, dtype=np.int64)
        perm = rank
        for r in range(4):
            perm = np.lexsort((rank, pts[:, r], gid))
            sg = gid[perm]
            sp = pts[perm, r]
            brk = np.empty(n, dtype=bool)
            brk[0] = True
            brk[1:] = (sg[1:] != sg[:-1]) | (sp[1:] - sp[:-1] > gap)
            gid[perm] = np.cumsum(brk) - 1
            rank[perm] = np.arange(n, dtype=np.int64)
        starts = np.nonzero(brk)[0].tolist() + [n]
        got = [perm[a:b].tolist() for a, b in zip(starts[:-1], starts[1:])]
        assert got == want, (trial, rows, gap, got, want)


def test_tracer_output(tmp_path, capsys):
    """Verbose phase lines / region lines / summary (SURVEY §5 tracing)."""
    import io
    from aletsch_tpu.utils.tracing import Tracer, rss_mb

    buf = io.StringIO()
    tr = Tracer(verbose=2, stream=buf)
    with tr.phase("profile-samples"):
        tr.add("bundles", 5)
    tr.region_line("chr1", 0, 5, 2)
    tr.counters["bundles"] = 5
    tr.summary()
    out = buf.getvalue()
    assert "profile-samples done" in out
    assert "region chr1:0" in out
    assert "bundles/s" in out
    assert rss_mb() > 0

    quiet = io.StringIO()
    tq = Tracer(verbose=0, stream=quiet)
    with tq.phase("x"):
        pass
    tq.summary()
    assert quiet.getvalue() == ""


def test_incubator_verbose_lines(tmp_path, capsys):
    """End-to-end: verbose=2 emits phase + region lines on stderr."""
    import io
    import os
    from aletsch_tpu.config import default_params
    from aletsch_tpu.meta.incubator import Incubator
    from simulate import simulate_sample

    bam = str(tmp_path / "s.bam")
    simulate_sample(bam, seed=4)
    bl = tmp_path / "b.list"
    bl.write_text("%s x paired_end\n" % bam)
    params = default_params()
    out_dir = str(tmp_path / "gtf")
    os.makedirs(out_dir)
    for p in params:
        p.input_bam_list = str(bl)
        p.output_gtf_file = str(tmp_path / "meta.gtf")
        p.output_gtf_dir = out_dir
        p.verbose = 2
    inc = Incubator(params)
    inc.tracer.stream = buf = io.StringIO()
    inc.resolve()
    out = buf.getvalue()
    assert "index-inputs done" in out
    assert "assemble-regions done" in out
    assert "region chr1:0" in out
    assert "bundles/s" in out


def _flag_cohort(tmp_path):
    from simulate import simulate_sample
    bam = str(tmp_path / "s.bam")
    simulate_sample(bam, seed=11)
    bl = tmp_path / "b.list"
    bl.write_text("%s x paired_end\n" % bam)
    return str(bl), bam


def _run_flags(tmp_path, bl, tag, **kw):
    import os
    from aletsch_tpu.config import default_params
    from aletsch_tpu.meta.incubator import Incubator
    from aletsch_tpu.io.gtf import read_gtf
    params = default_params()
    out_dir = str(tmp_path / (tag + "_gtf"))
    os.makedirs(out_dir, exist_ok=True)
    for p in params:
        p.input_bam_list = bl
        p.output_gtf_file = str(tmp_path / (tag + ".gtf"))
        p.output_gtf_dir = out_dir
        p.verbose = 0
        for k, v in kw.items():
            setattr(p, k, v)
    Incubator(params).resolve()
    return read_gtf(str(tmp_path / (tag + ".gtf")))


def test_uniquely_mapped_only_drops_multimappers(tmp_path):
    """NH>1 hits are dropped only under --uniquely_mapped_only; with every
    read marked NH=2 the stranded genes disappear entirely."""
    import random
    from aletsch_tpu.sim import simulate_pairs, write_bam
    rng = random.Random(5)
    from aletsch_tpu.sim import GENE_A_ISO1
    recs = simulate_pairs(GENE_A_ISO1, 60, "+", rng, prefix="m")
    for r in recs:
        r["nh"] = 2
    bam = str(tmp_path / "mm.bam")
    write_bam(bam, recs)
    bl = tmp_path / "mm.list"
    bl.write_text("%s x paired_end\n" % bam)
    keep = _run_flags(tmp_path, str(bl), "keep")
    drop = _run_flags(tmp_path, str(bl), "drop", uniquely_mapped_only=True)
    assert len(keep) >= 1
    assert len(drop) == 0


def test_use_second_alignment_flag(tmp_path):
    """Secondary alignments participate only under --use_second_alignment."""
    import random
    from aletsch_tpu.sim import simulate_pairs, write_bam, GENE_A_ISO1
    rng = random.Random(6)
    recs = simulate_pairs(GENE_A_ISO1, 60, "+", rng, prefix="p")
    for r in recs:
        r["flag"] |= 0x100          # everything secondary
    bam = str(tmp_path / "sec.bam")
    write_bam(bam, recs)
    bl = tmp_path / "sec.list"
    bl.write_text("%s x paired_end\n" % bam)
    # reference default is use_second_alignment = true (parameters.cc:58)
    off = _run_flags(tmp_path, str(bl), "off", use_second_alignment=False)
    on = _run_flags(tmp_path, str(bl), "on")
    assert len(off) == 0
    assert len(on) >= 1


def test_region_boundary_duplicate_suppression(tmp_path):
    """bundle_group.remove_duplicates (bundle_group.cc:58-91): a gene whose
    reads are re-read by the next region's seek overlap must not yield a
    doubled transcript.  Force tiny regions so a gene straddles a region
    line, then check the combined output has exactly one copy per chain."""
    import random
    from collections import Counter
    from aletsch_tpu.meta.incubator import Incubator
    from aletsch_tpu.io.gtf import read_gtf
    from aletsch_tpu.sim import simulate_pairs, write_bam
    from aletsch_tpu.config import default_params
    import os

    def chain(exons):
        return tuple((exons[k - 1][1], exons[k][0])
                     for k in range(1, len(exons)))

    # genes placed around multiples of the (shrunken) region length
    region_len = 20000
    genes = []
    for g in range(6):
        base = 15000 + g * region_len   # straddles every region line
        genes.append([(base, base + 400), (base + 3000, base + 3300),
                      (base + 7000, base + 7400)])
    rng = random.Random(12)
    recs = []
    for gi, exons in enumerate(genes):
        recs += simulate_pairs(exons, 40, "+" if gi % 2 == 0 else "-",
                               rng, prefix="g%d" % gi)
    bam = str(tmp_path / "rb.bam")
    write_bam(bam, recs, ("chr1",), (10**6,))
    bl = tmp_path / "rb.list"
    bl.write_text("%s x paired_end\n" % bam)
    params = default_params()
    out_dir = str(tmp_path / "gtf")
    os.makedirs(out_dir)
    for p in params:
        p.input_bam_list = str(bl)
        p.output_gtf_file = str(tmp_path / "meta.gtf")
        p.output_gtf_dir = out_dir
        p.region_partition_length = region_len
        p.verbose = 0
    inc = Incubator(params)
    inc.resolve()
    trsts = [t for t in read_gtf(str(tmp_path / "meta.gtf"))
             if len(t.exons) > 1]
    counts = Counter(chain(t.exons) for t in trsts)
    for gi, exons in enumerate(genes):
        assert counts[chain(exons)] == 1, (gi, counts[chain(exons)])
    # note: with gap-aligned region tables (set_batch_boundaries only
    # switches regions at coverage gaps) regions never overlap, so
    # remove_duplicates is defensive parity; this pins the invariant that
    # straddling genes are assembled exactly once


def test_output_single_exon_transcripts_flag(tmp_path):
    """Default skips single-exon-only bundles; the flag assembles them
    (skip_single_exon_transcripts, generator.cc / parameters.cc)."""
    import random
    from aletsch_tpu.sim import simulate_pairs, write_bam
    rng = random.Random(2)
    recs = simulate_pairs([(50000, 51200)], 200, "+", rng, prefix="se")
    bam = str(tmp_path / "se.bam")
    write_bam(bam, recs)
    bl = tmp_path / "se.list"
    bl.write_text("%s x paired_end\n" % bam)
    off = _run_flags(tmp_path, str(bl), "se_off")
    on = _run_flags(tmp_path, str(bl), "se_on",
                    skip_single_exon_transcripts=False)
    assert len(off) == 0
    assert len(on) == 1
    assert len(on[0].exons) == 1
