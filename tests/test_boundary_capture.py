"""Region grid captured on the preview decode == the standalone pass.

The native preview scan piggybacks the sample_profile region-boundary
state machine (abam.cpp boundary tracker + drain-to-EOF), eliminating one
full-file decode per sample.  The captured tables must be identical to
set_batch_boundaries' own sweep — including the drained tail past the
insert-size cap and multi-chromosome closure.
"""

import copy
import random

from aletsch_tpu.config import default_params
from aletsch_tpu.constants import PAIRED_END
from aletsch_tpu.meta.previewer import Previewer
from aletsch_tpu.meta.sample_profile import SampleProfile
from aletsch_tpu.sim import simulate_pairs, write_bam


def _make_bam(path, region_len):
    rng = random.Random(5)
    names = ("chr1", "chr2")
    lengths = (int(region_len * 4.5), int(region_len * 2.5))
    recs = []
    for ci, (nm, ln) in enumerate(zip(names, lengths)):
        pos = 30000
        while pos < ln - 40000:
            exons = []
            p = pos
            for _ in range(rng.randint(1, 3)):
                el = rng.randint(150, 400)
                exons.append((p, p + el))
                p += el + rng.randint(400, 1500)
            recs += [(ci, r) for r in
                     simulate_pairs(exons, rng.randint(5, 15),
                                    "+" if pos % 2 else "-", rng,
                                    prefix="c%dg%d" % (ci, pos))]
            # large gaps force region splits at partition boundaries
            pos = p + rng.choice([60000, int(region_len * 0.7)])
    allr = []
    for ci, r in recs:
        r["tid"] = ci
        r["mtid"] = ci
        allr.append(r)
    write_bam(path, allr, names, lengths)


def test_preview_captured_regions_match_standalone(tmp_path):
    region_len = 200000
    bam = str(tmp_path / "s.bam")
    _make_bam(bam, region_len)
    params = default_params()
    cfg = params[PAIRED_END]
    sp = SampleProfile(0, region_len)
    sp.align_file = bam
    sp.data_type = PAIRED_END
    pre = Previewer(cfg, sp)
    pre.infer_library_type()
    pre.infer_insertsize(capture_regions=True)
    assert getattr(sp, "_preview_regions", None) == \
        (cfg.min_bundle_gap, cfg.max_read_span)
    captured = (copy.deepcopy(sp.start1), copy.deepcopy(sp.start2),
                copy.deepcopy(sp.start_off), copy.deepcopy(sp.end1),
                copy.deepcopy(sp.end2))
    # multi-chromosome + multi-region: the capture must be non-trivial
    assert sum(1 for t in captured[3] for v in t if v) >= 3

    sp._preview_regions = None          # force the standalone sweep
    sp.set_batch_boundaries(cfg.min_bundle_gap, cfg.max_read_span)
    standalone = (sp.start1, sp.start2, sp.start_off, sp.end1, sp.end2)
    assert captured == standalone
