"""f32 Pallas fused-drain kernel vs the f64 host oracle.

The kernel (ops/pallas_drain.py) must reproduce drain_host bit-exactly
on integer-weight batches (the exactness regime integer_exact gates);
on CPU the kernel body runs in interpret mode, so these tests exercise
the same program the chip compiles."""

import numpy as np
import pytest

from aletsch_tpu.ops import crossover, greedy_fused, pallas_drain

pytestmark = pytest.mark.skipif(not pallas_drain.pallas_available(),
                                reason="pallas unavailable")


def _case(B=16, V=64, seed=3):
    W, P, sink, scal = crossover.synth_batch(B, V, seed=seed)
    return W, P, sink, scal[:, 0], scal[:, 1], scal[:, 2]


@pytest.mark.parametrize("seed", [3, 11, 29, 57])
def test_matches_f64_host_oracle(seed):
    W, P, sink, mc, gd, sm = _case(seed=seed)
    ph, wsh, nh = greedy_fused.drain_host(W, P, sink, mc, gd, sm, maxp=64)
    pp, wsp, npp = pallas_drain.drain_pallas(W, P, sink, mc, gd, sm,
                                             maxp=64)
    assert np.array_equal(nh, npp)
    assert np.array_equal(ph, pp)
    assert np.array_equal(wsh.astype(np.float32), wsp)


def test_inactive_and_empty_rows():
    W, P, sink, mc, gd, sm = _case()
    sink = sink.copy()
    sink[::2] = 0                      # half the rows inactive
    ph, wsh, nh = greedy_fused.drain_host(W, P, sink, mc, gd, sm, maxp=64)
    pp, wsp, npp = pallas_drain.drain_pallas(W, P, sink, mc, gd, sm,
                                             maxp=64)
    assert np.array_equal(nh, npp)
    assert (npp[::2] == 0).all()
    assert np.array_equal(ph, pp)


def test_integer_exact_gate():
    W, _P, _s, _m, _g, _sm = _case()
    assert pallas_drain.integer_exact(W)
    W2 = W.copy()
    act = W2 >= 0
    W2[act] += 0.5
    assert not pallas_drain.integer_exact(W2)
    W3 = W.copy()
    W3[act] = float(1 << 25)
    assert not pallas_drain.integer_exact(W3)
    assert pallas_drain.integer_exact(np.full((2, 4, 4), -1.0e18))


def test_device_greedy_fused_pallas_form(monkeypatch):
    """DeviceGreedyFused with the Pallas form forced (interpret mode on
    CPU): same results as the XLA f64 form, trust hint set from the
    integer gate."""
    monkeypatch.setenv("ALETSCH_PALLAS_DRAIN", "1")
    B, V = 16, 64
    W, P, sink, scal = crossover.synth_batch(B, V, seed=7)
    fd = greedy_fused.DeviceGreedyFused(batch=B, maxv=V)
    assert fd.stats["fused_form"] == "pallas_f32"
    fd.W[:], fd.P[:], fd.sink[:], fd.scal[:] = W, P, sink, scal
    paths, ws, npaths = fd.solve(B)
    assert fd.last_trust is True
    ph, wsh, nh = greedy_fused.drain_host(
        W, P, sink, scal[:, 0], scal[:, 1], scal[:, 2], maxp=fd.maxp)
    assert np.array_equal(nh, npaths)
    assert np.array_equal(ph, paths)
    assert np.array_equal(wsh, ws)     # f64 view of exact integers
    # non-integer weights flip the trust hint off
    fd.W[fd.W >= 0] += 0.25
    fd.solve(B)
    assert fd.last_trust is False


def test_xla_form_retained_without_env(monkeypatch):
    monkeypatch.delenv("ALETSCH_PALLAS_DRAIN", raising=False)
    import jax
    if jax.default_backend() == "tpu":       # pragma: no cover
        pytest.skip("on-chip default is the pallas form")
    fd = greedy_fused.DeviceGreedyFused(batch=16, maxv=64)
    assert fd.stats["fused_form"] == "xla_f64"
    assert fd.last_trust is None


def test_maxp_cap():
    """More extractions than MAXP: the kernel stops at the cap exactly
    like the host oracle (the native consumer re-checks with
    greedy_finish_host either way)."""
    W, P, sink, mc, gd, sm = _case(B=8, seed=3)
    maxp = 2                           # far below the ~5 paths per graph
    ph, wsh, nh = greedy_fused.drain_host(W, P, sink, mc, gd, sm,
                                          maxp=maxp)
    pp, wsp, npp = pallas_drain.drain_pallas(W, P, sink, mc, gd, sm,
                                             maxp=maxp)
    assert (nh <= maxp).all() and np.array_equal(nh, npp)
    assert np.array_equal(ph, pp)
    assert np.array_equal(wsh.astype(np.float32), wsp)
