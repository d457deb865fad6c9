import numpy as np
import pytest

from aletsch_tpu.ops.bridge_dp import bottleneck_all_sources_host
from aletsch_tpu.ops.pallas_kernels import (bottleneck_from_source_pallas,
                                            pallas_available)

pytestmark = pytest.mark.skipif(not pallas_available(),
                                reason="pallas unavailable")


def test_pallas_matches_oracle_interpret():
    rng = np.random.default_rng(3)
    B, V = 12, 16        # non-multiple of tile exercises padding
    W = np.triu(rng.uniform(0, 10, (B, V, V)).astype(np.float32), 1)
    W *= (rng.uniform(size=W.shape) < 0.4)
    T = np.asarray(bottleneck_from_source_pallas(W, interpret=True))
    Tref = bottleneck_all_sources_host(W)[:, 0, :]
    assert T.shape == (B, V)
    assert np.allclose(T, Tref, rtol=1e-5)


def test_pallas_disconnected():
    W = np.zeros((8, 8, 8), dtype=np.float32)
    T = np.asarray(bottleneck_from_source_pallas(W, interpret=True))
    # only the source itself is reachable
    assert (T[:, 1:] < -1e17).all()
    assert (T[:, 0] > 1e17).all()
