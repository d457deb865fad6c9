"""Golden parity vs the REAL reference binary's outputs.

tests/fixtures/goldens/<cohort>/ref_meta.gtf was produced by reference
Aletsch v1.1.2, built from /root/reference via the shim headers
(tools/refbuild/; regenerate with `python tools/refbuild/compare.py
--save-goldens`).  These tests re-simulate the exact cohorts (same seeds)
and assert our assembly reproduces the reference's intron-chain set
exactly, with boundary/coverage deltas bounded by the two documented
divergences (first-read-per-region skip and final-region drop --
sample_profile.cc:167-252; see tools/refbuild/compare.py docstring)."""

import os
import subprocess
import sys

import pytest

from tools.refbuild.compare import COHORTS, GOLDEN_DIR, parse_gtf, write_list

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_ours(d, lst):
    out = os.path.join(d, "ours")
    os.makedirs(os.path.join(out, "gtf"))
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    subprocess.run([sys.executable, "-m", "aletsch_tpu", "-i", lst, "-o",
                    os.path.join(out, "meta.gtf"), "-d",
                    os.path.join(out, "gtf"), "--verbose", "0"],
                   check=True, cwd=d, env=env)
    return os.path.join(out, "meta.gtf")


@pytest.mark.parametrize("name", sorted(COHORTS))
def test_golden_byte_parity_quirks(name, tmp_path, monkeypatch):
    """ALETSCH_REF_QUIRKS=1 (replicating the reference's region-table and
    id-accounting quirks) must reproduce the reference binary's meta GTF
    byte-for-byte (sorted; write order follows the reference's thread
    completion)."""
    golden = os.path.join(GOLDEN_DIR, name, "ref_meta.gtf")
    if not os.path.exists(golden):
        pytest.skip("golden not generated")
    monkeypatch.setenv("ALETSCH_REF_QUIRKS", "1")
    d = str(tmp_path)
    bams, protos = COHORTS[name](d)
    lst = write_list(d, bams, protos)
    ours = _run_ours(d, lst)
    assert sorted(open(ours).readlines()) == \
        sorted(open(golden).readlines())


@pytest.mark.parametrize("name", sorted(COHORTS))
def test_golden_chain_parity(name, tmp_path):
    golden = os.path.join(GOLDEN_DIR, name, "ref_meta.gtf")
    if not os.path.exists(golden):
        pytest.skip("golden not generated")
    d = str(tmp_path)
    bams, protos = COHORTS[name](d)
    lst = write_list(d, bams, protos)
    ours = parse_gtf(_run_ours(d, lst))
    ref = parse_gtf(golden)
    from tools.refbuild.compare import DEFAULT_DIVERGENT
    if name in DEFAULT_DIVERGENT:
        # default mode keeps the single-end/long reads the reference's
        # generator.cc:95 mate-span quirk silently drops past 500 kb
        # (docs/DESIGN.md), so our chain set is a strict superset; the
        # quirks-mode byte-parity test covers exact equality
        assert set(ref) <= set(ours), sorted(set(ref) - set(ours))
    else:
        assert set(ours) == set(ref), (
            "intron-chain set diverged from reference golden: only_ref=%s "
            "only_ours=%s" % (sorted(set(ref) - set(ours)),
                              sorted(set(ours) - set(ref))))
    for k in ref:
        a, b = ref[k], ours[k]
        # ends are exact; starts may move by the reference's dropped
        # first-read-per-region (<= 50 bp on these cohorts); coverage
        # tracks within 0.5 (the documented default-mode divergences —
        # first-read skip, final-region drop, preview buffer — shift
        # coverage slightly; quirks-mode byte parity is the exact check)
        assert b["end"] == a["end"], k
        assert abs(b["start"] - a["start"]) <= 50, k
        assert abs(b["cov"] - a["cov"]) <= 0.5, k
        assert b["count"] == a["count"], k
