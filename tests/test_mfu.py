"""MFU accounting unit checks (ops/mfu.py): analytic models, peak tables,
and the bound classification (the measured block itself runs in bench.py
on the real chip)."""

from aletsch_tpu.ops import mfu


def test_models_positive_and_scale():
    f1, b1 = mfu.model_greedy_fused(64, 64, 5)
    f2, b2 = mfu.model_greedy_fused(128, 64, 5)
    assert f1 > 0 and b1 > 0
    assert abs(f2 / f1 - 2.0) < 1e-9 and abs(b2 / b1 - 2.0) < 1e-9
    f, b = mfu.model_bridge_topk(64, 64, 16, 10, 5)
    assert f > 0 and b > 0
    f, b = mfu.model_support(64, 16, 64)
    assert f == 64 * 16 * 64
    f, b = mfu.model_pallas_bottleneck(64, 64)
    assert f > 0 and b == 4.0 * 64 * 64 * 64


def test_chip_peaks_lookup():
    assert mfu.chip_peaks("TPU v5 lite")["hbm_gbps"] == 819.0
    assert mfu.chip_peaks("TPU v5e")["hbm_gbps"] == 819.0
    assert mfu.chip_peaks("TPU v4")["mxu_bf16_tflops"] == 275.0
    assert mfu.chip_peaks("weird-device") is None


def test_entry_bound_classification():
    peaks = mfu.chip_peaks("TPU v5e")
    # tiny work over a long dispatch: latency-bound
    e = mfu._entry("x", 0.1, 1e6, 1e6, peaks)
    assert e["bound"] == "latency/serialization"
    # bandwidth-saturating dispatch
    e = mfu._entry("x", 0.001, 1e6, 819e9 * 0.001 * 0.5, peaks)
    assert e["bound"] == "bandwidth"
    # no peaks -> no bound key
    e = mfu._entry("x", 0.001, 1e6, 1e6, None)
    assert "bound" not in e
