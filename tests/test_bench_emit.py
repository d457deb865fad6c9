"""bench.py output contract: stdout's last line must be COMPACT strict
JSON (round-4 verdict weak#1: the ~8 KB single-line blob overflowed the
driver's capture -> BENCH_r04 "parsed": null).  The full tables live in
BENCH_DETAIL.json; the headline line stays small enough to never
truncate."""

import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import bench


def _fake_prod():
    return {"bundles_per_s": 123.4, "vs_reference_10t": 1.7,
            "wall_s": 7.2, "ref_wall_s": 12.3, "ref_same_window": True,
            "cpu_efficiency_vs_ref": 1.9, "steal_pct_window": 0.5,
            "device_stats": {"device_share": 0.0}, "bundles": 999}


def test_headline_is_compact_json(tmp_path, monkeypatch):
    # park the sidecar in tmp so the test never dirties the repo root
    monkeypatch.setattr(bench.os.path, "dirname",
                        lambda p, _d=os.path.dirname: str(tmp_path)
                        if p == os.path.abspath(bench.__file__)
                        else _d(p))
    big_note = "x" * 4000     # simulate the probe blobs that broke r04
    mfu = {"kernels": {"a": {"pct_of_hbm_peak": 0.004},
                       "b": {"error": "no chip"}},
           "analysis": big_note}
    cap = io.StringIO()
    monkeypatch.setattr(sys, "stdout", cap)
    bench.emit(_fake_prod(), {"hot": {"note": big_note}},
               {"break_even_B": None, "note": big_note},
               {"note": big_note}, {"note": big_note}, mfu,
               {"note": big_note}, {"rows": [], "note": big_note})
    monkeypatch.undo()
    line = cap.getvalue().strip().splitlines()[-1]
    j = json.loads(line)                      # strict JSON
    assert len(line) < 2000, "headline must stay small (driver capture)"
    assert j["metric"] == "bundles_per_second"
    assert j["vs_baseline"] == 1.7
    assert j["detail_file"] == "BENCH_DETAIL.json"
    detail = json.load(open(tmp_path / "BENCH_DETAIL.json"))
    assert detail["crossover"]["note"] == big_note
    assert detail["scaling_shape"]["note"] == big_note


def test_headline_survives_probe_errors(tmp_path, monkeypatch):
    monkeypatch.setattr(bench.os.path, "dirname",
                        lambda p, _d=os.path.dirname: str(tmp_path)
                        if p == os.path.abspath(bench.__file__)
                        else _d(p))
    prod = _fake_prod()
    prod["vs_reference_10t"] = None
    prod["ref_wall_s"] = None
    prod["cpu_efficiency_vs_ref"] = None
    cap = io.StringIO()
    monkeypatch.setattr(sys, "stdout", cap)
    bench.emit(prod, {"error": "x"}, {"error": "x"}, {"error": "x"},
               {"error": "x"}, {"error": "x"}, {"error": "x"}, None)
    monkeypatch.undo()
    j = json.loads(cap.getvalue().strip().splitlines()[-1])
    assert j["vs_baseline"] == 0.0
    assert j["break_even_B"] is None
