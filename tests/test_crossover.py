"""Crossover amortization model (ops/crossover.py + native core_bench_drain).

The round-3 review required the 'auto' device policy to decide from a
measured model -- dispatch_cost(B) < B * host_per_graph_cost -- rather
than a fixed per-dispatch threshold.  These tests pin:

- the native standalone drain (core_bench_drain) against the numpy
  drain oracle (ops/greedy_fused.py drain_host) on random dense batches,
- the measurement sweep's structure and fit arithmetic,
- the per-wave decision helper,
- that the cpu test platform never engages the device path.
"""

import numpy as np

from aletsch_tpu.meta import native_core
from aletsch_tpu.ops import crossover
from aletsch_tpu.ops.greedy_fused import DEFAULT_P, drain_host


def test_native_bench_drain_matches_oracle():
    rng = np.random.default_rng(17)
    B, V = 24, 48
    W = np.full((B, V, V), -1.0e18)
    P = np.full((B, V, V), -1, dtype=np.int32)
    sink = np.zeros(B, dtype=np.int32)
    scal = np.zeros((B, 3))
    for b in range(B):
        n = int(rng.integers(4, V))
        cnt = np.zeros(n, dtype=int)
        for j in range(1, n):
            for u in rng.choice(j, size=min(j, int(rng.integers(1, 4))),
                                replace=False):
                W[b, u, j] = float(rng.integers(1, 500))
                P[b, u, j] = cnt[j]
                cnt[j] += 1
        sink[b] = n - 1
        scal[b] = (2.0, 0.01, 1e-8)
    # a couple of inactive rows (sink 0) must stay untouched
    sink[3] = 0
    sink[11] = 0
    assert native_core.bench_drain_available()
    ws_n, np_n, build_s, drain_s = native_core.bench_drain(
        W, P, sink, scal, DEFAULT_P)
    _, ws_o, np_o = drain_host(W, P, sink, scal[:, 0], scal[:, 1],
                               scal[:, 2])
    assert np.array_equal(np_n, np_o)
    assert np.array_equal(ws_n, ws_o)
    assert build_s >= 0.0 and drain_s > 0.0
    assert np_n[3] == 0 and np_n[11] == 0


def test_measure_fit_and_break_even():
    cal = crossover.measure(batches=(8, 16), reps=1)
    assert [r["B"] for r in cal["table"]] == [8, 16]
    for r in cal["table"]:
        assert r["paths_agree"]     # cpu f64 is IEEE-exact
        assert r["device_dispatch_s"] > 0
        assert r["host_native_drain_s"] > 0
    f = cal["fit"]
    # the synthetic fit must reproduce a + b*B at the measured points
    t8 = f["a_fixed_dispatch_s"] + 8 * f["b_per_graph_device_s"]
    assert abs(t8 - cal["table"][0]["device_dispatch_s"]) < 0.5
    # on this host the "device" is the host itself: no crossover
    assert cal["break_even_B"] is None or cal["break_even_B"] > 0


def test_device_wins_model():
    cal = {"fit": {"a_fixed_dispatch_s": 0.10,
                   "b_per_graph_device_s": 1e-5,
                   "c_per_graph_host_s": 1e-3}}
    # break-even at ~101 graphs
    assert not crossover.device_wins(100, cal)
    assert crossover.device_wins(102, cal)
    assert not crossover.device_wins(10, cal)
    assert not crossover.device_wins(10, None)
    # marginal device cost above host cost: never wins
    cal["fit"]["b_per_graph_device_s"] = 2e-3
    assert not crossover.device_wins(10**9, cal)


def test_cpu_platform_stays_host(tmp_path):
    from aletsch_tpu.config import default_params
    from aletsch_tpu.meta import device_wave
    device_wave._AUTO_CAL = ("unset",)
    try:
        cfg = default_params()[0]
        assert device_wave.auto_calibration(cfg) is None
        assert not device_wave.auto_device_ok(cfg, n_graphs=10**6)
        assert not device_wave.enabled(cfg, n_groups=10**6) or \
            cfg.device_greedy != "auto"
    finally:
        device_wave._AUTO_CAL = ("unset",)


def test_fit_clamps_negative_intercept_and_window():
    """Round-4 verdict weak#2: cached rows from other measurement windows
    must not drag the fixed dispatch cost negative; the fit prefers
    same-window rows and clamps a >= 0."""
    import numpy as np

    from aletsch_tpu.ops.crossover import _clamped_line, _fit_rows

    # a data set whose unconstrained lstsq intercept is negative
    Bs = np.array([64.0, 256.0, 1024.0])
    td = np.array([0.001, 0.020, 0.110])
    a, b = _clamped_line(Bs, td)
    assert a >= 0.0
    assert b > 0
    # prediction stays sane at the measured points
    pred = a + b * Bs
    assert np.all(pred > 0)

    table = [{"B": 64, "device_dispatch_s": 0.01},
             {"B": 256, "device_dispatch_s": 0.04},
             {"B": 512, "device_dispatch_s": 9.99, "cached": True}]
    rows, tag = _fit_rows(table)
    assert tag == "fresh" and len(rows) == 2
    rows, tag = _fit_rows([table[0], table[2]])
    assert tag == "mixed" and len(rows) == 2
