"""Real-data mesh wave: sharded step == single-device == host oracle on
tensors extracted from an actual 2-sample cohort, and full-pipeline
transcript equality with every device path engaged on the virtual 8-device
mesh (VERDICT r1 task 3; SURVEY §2.8 cross-sample communication)."""

import os

import numpy as np
import pytest


def _cohort(tmp_path):
    from aletsch_tpu.sim import simulate_sample
    b0 = str(tmp_path / "s0.bam")
    b1 = str(tmp_path / "s1.bam")
    simulate_sample(b0, seed=41)
    simulate_sample(b1, seed=42)
    lst = str(tmp_path / "bams.list")
    with open(lst, "w") as fh:
        fh.write("%s %s.bai paired_end\n%s %s.bai paired_end\n"
                 % (b0, b0, b1, b1))
    return lst


def _params(tmp_path, lst, sub, **kw):
    from aletsch_tpu.config import default_params
    out = tmp_path / sub
    (out / "gtf").mkdir(parents=True)
    params = default_params()
    for p in params:
        p.input_bam_list = lst
        p.output_gtf_file = str(out / "meta.gtf")
        p.output_gtf_dir = str(out / "gtf")
        p.verbose = 0
        for k, v in kw.items():
            setattr(p, k, v)
    return params, out


def _read_outputs(out):
    files = {"meta.gtf": (out / "meta.gtf").read_bytes()}
    for f in sorted(os.listdir(out / "gtf")):
        files[f] = (out / "gtf" / f).read_bytes()
    return files


def test_real_wave_sharded_equals_oracle(tmp_path):
    """Extract a real cohort wave and check the sharded mesh step against
    the single-device jit and the numpy oracle — exact for the order-free
    outputs, 1e-6 for the float-order-sensitive coverage stats."""
    import jax
    import jax.numpy as jnp
    from aletsch_tpu.parallel.mesh import (_step_impl, build_sharded_step,
                                           make_mesh)
    from aletsch_tpu.parallel.wave_extract import (capture_cohort_tensors,
                                                   host_oracle)

    lst = _cohort(tmp_path)
    params, _ = _params(tmp_path, lst, "cap")
    tensors, info = capture_cohort_tensors(params, B=8, V=32, S=16,
                                           P_=64, Ns=2, J=16)
    assert info["groups"] >= 2
    assert info["samples"] == 2
    assert info["junctions"] >= 1, "no cross-sample junction support"
    # the support tensor must carry real multi-sample weight
    jsup = tensors[6]
    assert (jsup != 0).any(axis=(1, 2)).all(), \
        "a sample contributed no junction weight"

    mesh = make_mesh(8)
    assert mesh.shape["data"] * mesh.shape["sample"] == 8
    want = host_oracle(*tensors)
    single = jax.jit(_step_impl(jnp, jax))(
        *(jnp.asarray(a) for a in tensors))
    sharded = build_sharded_step(mesh)(*(jnp.asarray(a) for a in tensors))
    names = ("bottleneck", "ave", "dev", "mx", "sim", "support")
    exact = {"bottleneck", "mx", "sim", "support"}
    for name, o, g1, g2 in zip(names, want, single, sharded):
        g1, g2 = np.asarray(g1), np.asarray(g2)
        if name in exact:
            assert np.array_equal(g1, g2), "sharded %s != single" % name
            assert np.array_equal(g2, o), "sharded %s != oracle" % name
        else:
            assert np.allclose(g1, g2, rtol=1e-6, atol=1e-6), name
            assert np.allclose(g2, o, rtol=1e-6, atol=1e-6), name
    # the similarity matmul must see the real splice sets: each group's
    # self-intersection equals its splice count (off-diagonals are zero
    # here because the captured groups are distinct genes)
    sim = np.asarray(sharded[4])
    inc = tensors[5]
    assert np.array_equal(np.diag(sim), inc.sum(axis=1))
    assert np.diag(sim).max() >= 2.0, "no real splice set reached sim"


def test_capture_is_transparent(tmp_path):
    """The extraction hook must not perturb the pipeline: outputs with and
    without capture are byte-identical (the draft-graph builds read the
    bundles through _BundleView copies only)."""
    lst = _cohort(tmp_path)
    from aletsch_tpu.meta.incubator import Incubator
    from aletsch_tpu.parallel.wave_extract import capture_cohort_tensors
    params, out_a = _params(tmp_path, lst, "plain")
    Incubator(params).resolve()
    params_b, out_b = _params(tmp_path, lst, "captured")
    capture_cohort_tensors(params_b, B=8, V=32, S=16, P_=64, Ns=2, J=16)
    assert _read_outputs(out_a) == _read_outputs(out_b)


@pytest.mark.skipif(os.environ.get("ALETSCH_NATIVE_CORE") == "0",
                    reason="device paths require the native core")
def test_all_device_paths_transcript_equality(tmp_path):
    """2-sample cohort on the virtual 8-device mesh: greedy DP + bridging
    DP + support reduce + similarity matmul ALL on device must reproduce
    the host transcripts byte-for-byte."""
    from aletsch_tpu.meta import device_wave
    from aletsch_tpu.meta.incubator import Incubator
    lst = _cohort(tmp_path)
    params, out_a = _params(tmp_path, lst, "host", device_greedy="off",
                            device_bridge="off", device_support="off",
                            device_similarity="off")
    Incubator(params).resolve()
    b0 = dict(device_wave.stats)
    params, out_b = _params(tmp_path, lst, "device", device_greedy="on",
                            device_bridge="on", device_support="on",
                            device_similarity="on",
                            device_min_vertices=2, device_min_groups=0)
    Incubator(params).resolve()
    assert _read_outputs(out_a) == _read_outputs(out_b)
    assert device_wave.stats["device_bridge_insts"] > \
        b0["device_bridge_insts"]
    assert device_wave.stats["device_support_groups"] > \
        b0["device_support_groups"]


def test_dryrun_multichip_runs(tmp_path):
    """The driver's dryrun entry (real tensors + parity asserts) must pass
    on the virtual 8-device mesh."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
