"""--profile pass, profile_dir caching, and -L chromosome-file filter."""

import os

from aletsch_tpu.config import default_params
from aletsch_tpu.io.gtf import read_gtf
from aletsch_tpu.meta.incubator import Incubator
from simulate import simulate_sample


def setup_cohort(tmp_path):
    bams = []
    for s in range(2):
        p = str(tmp_path / ("s%d.bam" % s))
        simulate_sample(p, seed=s + 7)
        bams.append(p)
    bl = tmp_path / "bams.list"
    bl.write_text("".join("%s %s.bai paired_end\n" % (b, b) for b in bams))
    return str(bl)


def make_params(bl, tmp_path, **kw):
    params = default_params()
    out_dir = str(tmp_path / "gtf")
    os.makedirs(out_dir, exist_ok=True)
    for p in params:
        p.input_bam_list = bl
        p.output_gtf_file = str(tmp_path / "meta.gtf")
        p.output_gtf_dir = out_dir
        p.verbose = 0
        for k, v in kw.items():
            setattr(p, k, v)
    return params


def test_profile_only_writes_profiles(tmp_path):
    bl = setup_cohort(tmp_path)
    pdir = str(tmp_path / "profiles")
    os.makedirs(pdir)
    params = make_params(bl, tmp_path, profile_only=True, profile_dir=pdir)
    Incubator(params).resolve()
    for sid in range(2):
        path = os.path.join(pdir, "%d.profile" % sid)
        assert os.path.exists(path)
        with open(path) as fh:
            content = fh.read()
        assert "library_type" in content
        assert "insertsize_low" in content
    # no assembly output in profile-only mode
    assert not os.path.exists(str(tmp_path / "meta.gtf"))


def test_profile_cache_reused(tmp_path):
    bl = setup_cohort(tmp_path)
    pdir = str(tmp_path / "profiles")
    os.makedirs(pdir)
    params = make_params(bl, tmp_path, profile_only=True, profile_dir=pdir)
    Incubator(params).resolve()
    # plant a recognizable cached value; the run must load it, not re-infer
    prof = os.path.join(pdir, "0.profile")
    with open(prof) as fh:
        lines = fh.read().splitlines()
    lines = [("insertsize_high 444" if l.startswith("insertsize_high") else l)
             for l in lines]
    with open(prof, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    params = make_params(bl, tmp_path, profile_dir=pdir)
    inc = Incubator(params)
    inc.resolve()
    assert inc.samples[0].insertsize_high == 444
    assert len(read_gtf(str(tmp_path / "meta.gtf"))) >= 2


def test_chrm_list_file(tmp_path):
    bl = setup_cohort(tmp_path)
    lf = tmp_path / "chrs.txt"
    lf.write_text("chrX\n")        # no such chromosome in the BAMs
    params = make_params(bl, tmp_path, chrm_list_file=str(lf))
    inc = Incubator(params)
    inc.resolve()
    assert inc.stats["bundles"] == 0
    lf.write_text("chr1\n")
    params = make_params(bl, tmp_path, chrm_list_file=str(lf))
    inc = Incubator(params)
    inc.resolve()
    assert inc.stats["bundles"] > 0


def test_region_sidecar_roundtrip_and_invalidation(tmp_path):
    from aletsch_tpu.meta.sample_profile import SampleProfile
    bl = setup_cohort(tmp_path)
    bam = bl and open(bl).read().split()[0]
    sp = SampleProfile(0, 1000000)
    sp.align_file = bam
    sp.set_batch_boundaries(50, 500000)
    d = str(tmp_path / "profiles")
    os.makedirs(d, exist_ok=True)
    sp.save_regions(d, 50, 500000)
    sp2 = SampleProfile(0, 1000000)
    sp2.align_file = bam
    assert sp2.load_regions(d, 50, 500000)
    assert sp2.target_names == sp.target_names
    assert sp2.start1 == sp.start1 and sp2.start_off == sp.start_off
    assert sp2.end1 == sp.end1 and sp2.end2 == sp.end2
    # different sweep parameters must miss
    sp3 = SampleProfile(0, 1000000)
    sp3.align_file = bam
    assert not sp3.load_regions(d, 999, 500000)
    # changed BAM size must miss
    with open(bam, "ab") as fh:
        fh.write(b"\x00" * 64)
    sp4 = SampleProfile(0, 1000000)
    sp4.align_file = bam
    assert not sp4.load_regions(d, 50, 500000)


def test_region_sidecar_used_on_assembly(tmp_path):
    """A cached-regions run must produce the same GTF as a cold run."""
    bl = setup_cohort(tmp_path)
    pdir = str(tmp_path / "profiles")
    os.makedirs(pdir)
    params = make_params(bl, tmp_path, profile_only=True, profile_dir=pdir)
    Incubator(params).resolve()
    params = make_params(bl, tmp_path, profile_dir=pdir)
    Incubator(params).resolve()
    cold = open(str(tmp_path / "meta.gtf")).read()
    # sidecars now exist; rerun loads them
    for sid in range(2):
        assert os.path.exists(os.path.join(pdir, "%d.regions.npz" % sid))
    os.remove(str(tmp_path / "meta.gtf"))
    params = make_params(bl, tmp_path, profile_dir=pdir)
    Incubator(params).resolve()
    assert open(str(tmp_path / "meta.gtf")).read() == cold


def test_region_checkpoint_resume(tmp_path):
    """--checkpoint_dir: a rerun loads completed regions and produces
    byte-identical output; a partial checkpoint set resumes the rest."""
    import shutil
    bl = setup_cohort(tmp_path)
    ck = str(tmp_path / "ckpt")

    def run(tag, ckpt):
        params = make_params(bl, tmp_path, checkpoint_dir=ckpt)
        out = str(tmp_path / (tag + ".gtf"))
        for p in params:
            p.output_gtf_file = out
            p.output_gtf_dir = str(tmp_path / (tag + "_gtf"))
            os.makedirs(p.output_gtf_dir, exist_ok=True)
        inc = Incubator(params)
        inc.resolve()
        return open(out).read(), inc

    base, inc0 = run("nock", "")               # no checkpointing
    cold, inc1 = run("cold", ck)               # writes checkpoints
    assert cold == base
    cks = sorted(os.listdir(ck))
    assert cks, "no checkpoint files written"
    warm, inc2 = run("warm", ck)               # all regions from checkpoint
    assert warm == base
    assert inc2.stats["bundles"] == inc1.stats["bundles"]
    # partial resume: drop one region's checkpoint
    os.remove(os.path.join(ck, cks[0]))
    part, _ = run("part", ck)
    assert part == base
    assert os.path.exists(os.path.join(ck, cks[0]))   # re-written
