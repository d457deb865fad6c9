import numpy as np
import pytest

from aletsch_tpu.ops.bridge_dp import bottleneck_all_sources_host
from aletsch_tpu.ops.pallas_kernels import (bottleneck_from_source_pallas,
                                            pallas_available)

pytestmark = pytest.mark.skipif(not pallas_available(),
                                reason="pallas unavailable")


@pytest.mark.parametrize("version", [1, 2])
def test_pallas_matches_oracle_interpret(version):
    rng = np.random.default_rng(3)
    B, V = 12, 16        # non-multiple of tile exercises padding
    W = np.triu(rng.uniform(0, 10, (B, V, V)).astype(np.float32), 1)
    W *= (rng.uniform(size=W.shape) < 0.4)
    T = np.asarray(bottleneck_from_source_pallas(W, interpret=True,
                                                 version=version))
    Tref = bottleneck_all_sources_host(W)[:, 0, :]
    assert T.shape == (B, V)
    assert np.allclose(T, Tref, rtol=1e-5)


def test_pallas_v1_v2_identical():
    rng = np.random.default_rng(9)
    B, V = 16, 32
    W = np.triu(rng.uniform(0, 10, (B, V, V)).astype(np.float32), 1)
    W *= (rng.uniform(size=W.shape) < 0.3)
    t1 = np.asarray(bottleneck_from_source_pallas(W, interpret=True,
                                                  version=1))
    t2 = np.asarray(bottleneck_from_source_pallas(W, interpret=True,
                                                  version=2))
    assert np.array_equal(t1, t2)


def test_pallas_greedy_backend_matches_xla_exactly():
    """get_greedy_pallas_fn (NEG-form v2) must be BIT-identical to the XLA
    scan DeviceGreedy uses — including zero-weight edges, which the 0-form
    kernels treat as absent."""
    from aletsch_tpu.ops.greedy_dp import NEG, single_source_host, _build
    from aletsch_tpu.ops.pallas_kernels import get_greedy_pallas_fn
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    B, V = 32, 32
    W = np.triu(rng.uniform(0, 10, (B, V, V)).astype(np.float32), 1)
    W = np.where((rng.uniform(size=W.shape) < 0.3) & (W > 0), W,
                 np.float32(NEG))
    W[0, 0, 1] = 0.0                      # explicit zero-weight edge
    xla = jax.jit(_build(jax, jnp, V))
    got = np.asarray(get_greedy_pallas_fn(V, interpret=True)(W))
    assert np.array_equal(got, np.asarray(xla(W)))
    assert np.array_equal(got, single_source_host(W))
    assert got[0, 1] == 0.0               # zero-weight edge is reachable


@pytest.mark.parametrize("version", [1, 2])
def test_pallas_disconnected(version):
    W = np.zeros((8, 8, 8), dtype=np.float32)
    T = np.asarray(bottleneck_from_source_pallas(W, interpret=True,
                                                 version=version))
    # only the source itself is reachable
    assert (T[:, 1:] < -1e17).all()
    assert (T[:, 0] > 1e17).all()
