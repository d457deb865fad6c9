"""Differential tests for the native transcript-set (native/core_tset.h).

The Python TranscriptSet is the byte-exact oracle: every output file of a
run with native sets (default) must be byte-identical to the same run
with ALETSCH_NATIVE_TSET=0.  Covers both the C++ fast replay
(core_batch_merge_nts / core_out_merge_nts) and the Python-fallback
import path (nts_import_merge, exercised by verbose>=2 which makes every
group native-ineligible in meta/native_core.py::eligible)."""

import os
import random

import pytest

from aletsch_tpu.config import default_params
from aletsch_tpu.meta.incubator import Incubator
from aletsch_tpu.meta.native_tset import native_tset_available
from aletsch_tpu.sim import simulate_pairs, write_bam

pytestmark = pytest.mark.skipif(not native_tset_available(),
                                reason="native core unavailable")


def _make_cohort(tmp_path, n_samples=3, n_genes=6, seed0=300):
    rng0 = random.Random(77)
    genes = []
    pos = 50000
    for g in range(n_genes):
        ne = rng0.randint(1, 4)          # incl. single-exon genes
        exons = []
        p = pos
        for _ in range(ne):
            el = rng0.randint(200, 400)
            exons.append((p, p + el))
            p += el + rng0.randint(500, 1500)
        genes.append(exons)
        pos = p + rng0.randint(40000, 60000)
    bams = []
    for s in range(n_samples):
        rng = random.Random(seed0 + s)
        recs = []
        for gi, exons in enumerate(genes):
            strand = "+" if gi % 2 == 0 else "-"
            recs += simulate_pairs(exons, 25, strand, rng,
                                   prefix="s%dg%d" % (s, gi))
            if len(exons) >= 3:
                skip = exons[:1] + exons[2:]
                recs += simulate_pairs(skip, 8, strand, rng,
                                       prefix="s%dk%d" % (s, gi))
        p = str(tmp_path / ("s%d.bam" % s))
        write_bam(p, recs, names=("chr1",), lengths=(10**7,))
        bams.append(p)
    bl = tmp_path / "bams.list"
    bl.write_text("".join("%s %s.bai paired_end\n" % (b, b) for b in bams))
    return str(bl), n_samples


def _run(tmp_path, bl, sub, native, verbose=0):
    out_gtf = str(tmp_path / (sub + ".gtf"))
    out_dir = str(tmp_path / sub)
    os.makedirs(out_dir, exist_ok=True)
    params = default_params()
    for p in params:
        p.input_bam_list = bl
        p.output_gtf_file = out_gtf
        p.output_gtf_dir = out_dir
        p.verbose = verbose
    old = os.environ.get("ALETSCH_NATIVE_TSET")
    os.environ["ALETSCH_NATIVE_TSET"] = "1" if native else "0"
    try:
        inc = Incubator(params)
        inc.resolve()
    finally:
        if old is None:
            os.environ.pop("ALETSCH_NATIVE_TSET", None)
        else:
            os.environ["ALETSCH_NATIVE_TSET"] = old
    return out_gtf, out_dir, inc


def _compare_outputs(tmp_path, ga, da, gb, db, n_files):
    with open(ga, "rb") as f1, open(gb, "rb") as f2:
        assert f1.read() == f2.read(), "combined GTF differs"
    for j in range(n_files):
        for suff in ("%d.gtf", "%d.trstFeature.csv"):
            fa = os.path.join(da, suff % j)
            fb = os.path.join(db, suff % j)
            with open(fa, "rb") as f1, open(fb, "rb") as f2:
                assert f1.read() == f2.read(), "%s differs" % (suff % j)


def test_native_vs_python_byte_parity(tmp_path):
    bl, ns = _make_cohort(tmp_path)
    ga, da, inca = _run(tmp_path, bl, "nat", native=True)
    gb, db, incb = _run(tmp_path, bl, "pyo", native=False)
    assert inca._native_ts and not incb._native_ts
    with open(ga) as fh:
        assert sum(1 for l in fh if "\ttranscript\t" in l) > 0
    _compare_outputs(tmp_path, ga, da, gb, db, ns + 1)


def test_fallback_import_path_byte_parity(tmp_path, capfd):
    """verbose>=2 rejects every group from the native assembler
    (native_core.eligible), so the native sets are filled exclusively
    through nts_import_merge — the Python-assembled per-graph sets must
    fold in byte-identically."""
    bl, ns = _make_cohort(tmp_path, n_samples=2, n_genes=4)
    ga, da, inca = _run(tmp_path, bl, "natv2", native=True, verbose=2)
    gb, db, incb = _run(tmp_path, bl, "pyov2", native=False, verbose=2)
    capfd.readouterr()              # swallow the verbose diagnostics
    assert inca._native_ts
    from aletsch_tpu.meta import native_core
    _compare_outputs(tmp_path, ga, da, gb, db, ns + 1)


def test_native_sets_engage_by_default(tmp_path):
    """The production default must actually use the native sets AND the
    C++ replay (stats), not silently fall back."""
    from aletsch_tpu.meta import native_core
    bl, ns = _make_cohort(tmp_path, n_samples=2, n_genes=4, seed0=900)
    n0 = native_core.stats["native_groups"]
    ga, da, inc = _run(tmp_path, bl, "engage", native=True)
    assert inc._native_ts
    assert native_core.stats["native_groups"] > n0
    from aletsch_tpu.meta.native_tset import NativeTSet
    assert all(isinstance(tm, NativeTSet) for tm in inc.tts.values())
    assert sum(tm.size() for tm in inc.tts.values()) > 0
