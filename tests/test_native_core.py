"""Native assembly core: dispatch + byte parity against the Python path.

The core (native/core.cpp via meta/native_core.py) must (a) actually fire
for scanner-produced bundles — a broken eligibility check degrades to the
slow path silently — and (b) produce byte-identical GTF + feature output
with ALETSCH_NATIVE_CORE on and off.
"""

import os

import pytest

from aletsch_tpu.config import default_params
from aletsch_tpu.meta.incubator import Incubator
from aletsch_tpu.meta import native_core
from aletsch_tpu.sim import simulate_sample

from aletsch_tpu.io.bam_native import native_available


def _run(tmp, tag, bl):
    out_gtf = os.path.join(tmp, tag + ".gtf")
    out_dir = os.path.join(tmp, tag + "_d")
    os.makedirs(out_dir, exist_ok=True)
    params = default_params()
    for p in params:
        p.input_bam_list = bl
        p.output_gtf_file = out_gtf
        p.output_gtf_dir = out_dir
        p.verbose = 0
    Incubator(params).resolve()
    return out_gtf, out_dir


@pytest.mark.skipif(not native_available(), reason="no native library")
def test_native_core_fires_and_matches(tmp_path):
    tmp = str(tmp_path)
    b0 = os.path.join(tmp, "s0.bam")
    b1 = os.path.join(tmp, "s1.bam")
    simulate_sample(b0, seed=41)
    simulate_sample(b1, seed=42)
    bl = os.path.join(tmp, "bams.list")
    with open(bl, "w") as fh:
        fh.write("%s x paired_end\n%s x paired_end\n" % (b0, b1))

    before = native_core.stats["native_groups"]
    g1, d1 = _run(tmp, "native", bl)
    assert native_core.stats["native_groups"] > before, \
        "native core never dispatched for scanner bundles"

    os.environ["ALETSCH_NATIVE_CORE"] = "0"
    try:
        g2, d2 = _run(tmp, "python", bl)
    finally:
        del os.environ["ALETSCH_NATIVE_CORE"]

    assert open(g1).read() == open(g2).read()
    for fn in sorted(os.listdir(d1)):
        assert open(os.path.join(d1, fn)).read() == \
            open(os.path.join(d2, fn)).read(), fn


@pytest.mark.skipif(not native_available(), reason="no native library")
def test_merged_replay_engages_and_matches(tmp_path):
    """The in-worker wave replay (core_resolve_groups_mt_async_merge) must
    actually engage in the default configuration AND produce bytes
    identical to the join-time replay (ALETSCH_MT_MERGE=0)."""
    from aletsch_tpu.meta.native_core import _load_lib
    lib = _load_lib()
    if lib is None or not hasattr(lib, "core_resolve_groups_mt_async_merge"):
        pytest.skip("no merged-replay entry point")
    tmp = str(tmp_path)
    b0 = os.path.join(tmp, "s0.bam")
    b1 = os.path.join(tmp, "s1.bam")
    simulate_sample(b0, seed=51)
    simulate_sample(b1, seed=52)
    bl = os.path.join(tmp, "bams.list")
    with open(bl, "w") as fh:
        fh.write("%s x paired_end\n%s x paired_end\n" % (b0, b1))

    before = native_core.stats.get("merged_waves", 0)
    g1, d1 = _run(tmp, "merged", bl)
    assert native_core.stats.get("merged_waves", 0) > before, \
        "merged replay path never engaged"

    os.environ["ALETSCH_MT_MERGE"] = "0"
    try:
        g2, d2 = _run(tmp, "joinrep", bl)
    finally:
        del os.environ["ALETSCH_MT_MERGE"]

    assert open(g1).read() == open(g2).read()
    for fn in sorted(os.listdir(d1)):
        assert open(os.path.join(d1, fn)).read() == \
            open(os.path.join(d2, fn)).read(), fn


@pytest.mark.skipif(not native_available(), reason="no native library")
def test_async_free_exits_cleanly():
    """Regression: the nts_free_async drainer thread must not block
    process exit (a static condition_variable destructor once deadlocked
    against the detached waiter — core.cpp free_queue leaks its sync
    objects on purpose)."""
    import subprocess
    import sys
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from aletsch_tpu.meta.native_tset import NativeTSet, "
        "native_tset_available\n"
        "from aletsch_tpu.config import default_params\n"
        "from aletsch_tpu.constants import DEFAULT\n"
        "cfg = default_params()[DEFAULT]\n"
        "if native_tset_available():\n"
        "    for _ in range(500):\n"
        "        t = NativeTSet('chr1', 1, cfg)\n"
        "        del t\n"
        "print('ok')\n"
    ) % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       timeout=120, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ok" in r.stdout
