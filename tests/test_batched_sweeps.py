"""Parity of vectorized batch-array sweeps vs the per-record slow paths."""

import pytest

from aletsch_tpu.config import Parameters
from aletsch_tpu.constants import PAIRED_END
from aletsch_tpu.io.bam import BamReader
from aletsch_tpu.io.bam_native import NativeBamReader, native_available
from aletsch_tpu.meta.previewer import Previewer
from aletsch_tpu.meta.sample_profile import SampleProfile
from simulate import simulate_sample

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="libabam unavailable")


def make_bam(tmp_path):
    p = str(tmp_path / "t.bam")
    # small region length forces several regions and gap switches
    simulate_sample(p, seed=21)
    return p


def test_batch_boundaries_parity(tmp_path):
    p = make_bam(tmp_path)
    a = SampleProfile(0, 30000)
    a.align_file = p
    a.set_batch_boundaries(200, 500000)          # batched (native reader)

    b = SampleProfile(0, 30000)
    b.align_file = p
    with BamReader(p) as r:
        b._init_tables(r.header)
    with BamReader(p) as r:
        b._set_batch_boundaries_slow(r, 200, 500000)

    assert a.start1 == b.start1
    assert a.start2 == b.start2
    assert a.start_off == b.start_off
    assert a.end1 == b.end1


def test_library_type_parity(tmp_path):
    p = make_bam(tmp_path)
    cfg = Parameters()

    sa = SampleProfile(0, 10**6)
    sa.align_file = p
    sa.data_type = PAIRED_END
    pa = Previewer(cfg, sa)
    with NativeBamReader(p) as r:
        pa._infer_library_type_batched(r)

    sb = SampleProfile(0, 10**6)
    sb.align_file = p
    sb.data_type = PAIRED_END
    pb = Previewer(cfg, sb)
    with BamReader(p) as r:
        pb._infer_library_type_slow(r)

    assert sa.spn == sb.spn
    assert sa.num_xs == sb.num_xs
    assert sa.library_type == sb.library_type
    assert sa.bam_with_xs == sb.bam_with_xs


def test_generator_parity(tmp_path):
    from aletsch_tpu.config import Parameters
    from aletsch_tpu.meta.generator import Generator
    p = make_bam(tmp_path)
    sp = SampleProfile(0, 10**6)
    sp.align_file = p
    sp.set_batch_boundaries(200, 500000)
    cfg = Parameters()

    va = []
    ga = Generator(sp, va, cfg, 0, 0)
    with NativeBamReader(p) as r:
        ga._resolve_batched(r)

    vb = []
    gb = Generator(sp, vb, cfg, 0, 0)
    with BamReader(p) as r:
        gb._resolve_slow(r)

    assert len(va) == len(vb)
    for a, b in zip(va, vb):
        assert (a.lpos, a.rpos, a.strand, a.chrm) == (b.lpos, b.rpos, b.strand, b.chrm)
        assert len(a.hits) == len(b.hits)
        assert a.splices == b.splices
        assert [(h.pos, h.rpos, h.qname) for h in a.hits] == \
            [(h.pos, h.rpos, h.qname) for h in b.hits]
        la, _, wa = a.mmap.segments
        lb, _, wb = b.mmap.segments
        assert la.tolist() == lb.tolist() and wa.tolist() == wb.tolist()


def test_insertsize_parity(tmp_path):
    p = make_bam(tmp_path)
    cfg = Parameters()

    sa = SampleProfile(0, 10**6)
    sa.align_file = p
    sa.data_type = PAIRED_END
    pa = Previewer(cfg, sa)
    with NativeBamReader(p) as r:
        ma = pa._collect_insertsizes_batched(r)
    pa._finish_insertsize(ma)

    sb = SampleProfile(0, 10**6)
    sb.align_file = p
    sb.data_type = PAIRED_END
    pb = Previewer(cfg, sb)
    with BamReader(p) as r:
        mb = pb._collect_insertsizes_slow(r)
    pb._finish_insertsize(mb)

    assert ma == mb
    assert sa.insert_total == sb.insert_total
    assert (sa.insertsize_low, sa.insertsize_high, sa.insertsize_median) == \
        (sb.insertsize_low, sb.insertsize_high, sb.insertsize_median)


def test_insertsize_chunked_parity(tmp_path):
    """Chunk-batched native collector == per-bundle scan collector ==
    columnar Python collector, histogram-exact."""
    from aletsch_tpu.meta.native_core import (collect_insertsizes_chunked,
                                              preview_chunks_available)
    if not preview_chunks_available():
        pytest.skip("core_preview_chunk unavailable")
    p = make_bam(tmp_path)
    cfg = Parameters()
    sp = SampleProfile(0, 10**6)
    sp.align_file = p
    sp.data_type = PAIRED_END

    with NativeBamReader(p) as r:
        mc = collect_insertsizes_chunked(r, cfg, sp.library_type)
    pv = Previewer(cfg, sp)
    with NativeBamReader(p) as r:
        ms = pv._collect_insertsizes_scan(r)
    with NativeBamReader(p) as r:
        mb = pv._collect_insertsizes_batched(r)
    assert mc == ms == mb

    # epoch-cap semantics: a tiny cap must stop both paths identically
    cfg2 = Parameters()
    cfg2.max_preview_reads = 5
    with NativeBamReader(p) as r:
        mc2 = collect_insertsizes_chunked(r, cfg2, sp.library_type)
    pv2 = Previewer(cfg2, sp)
    with NativeBamReader(p) as r:
        ms2 = pv2._collect_insertsizes_scan(r)
    assert mc2 == ms2   # a one-epoch file caps identically (no truncation)
