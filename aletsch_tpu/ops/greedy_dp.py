"""Wave-batched single-source bottleneck DP for the greedy decomposition.

The greedy max-path extraction (rnacore/splice_graph.cc:819-885 via
scallop/scallop.cc:2874-2897) computes, per graph, the table
T[v] = max over paths source->v of the min edge weight.  Production wiring:
the native GroupRun pauses each group's Scallop at the greedy loop
(native/core.cpp), the incubator gathers every paused graph of the region
wave into one padded [B, V, V] adjacency batch (topo-index space, f32,
absent = NEG), this kernel computes all tables in one device dispatch, and
the native backtrace consumes them (core_scallop.h greedy_step_device).

Exactness: the native export refuses graphs whose f64->f32 weight cast is
not order-preserving, so every min/max comparison on device agrees with the
host's f64 DP and the recovered path + bottleneck are byte-identical
(differential-fuzz enforced with the device path forced on).

Shapes are fixed ([DEFAULT_B, DEFAULT_V]) so the axon relay compiles once;
larger graphs fall back to the host solver.
"""

from __future__ import annotations

import numpy as np

NEG = -1.0e18
POS = 1.0e18

DEFAULT_B = 64     # graphs per dispatch
DEFAULT_V = 64     # padded vertex count (bench shape; relay-cache friendly)

_CACHE = {}


def _build(jax, jnp, V):
    def single_source(W):
        """W: [B, V, V] topo-space adjacency (NEG = absent).  Returns
        T: [B, V] with T[b, v] = best bottleneck 0 -> v (NEG unreachable)."""
        B = W.shape[0]
        T0 = jnp.full((B, V), NEG, dtype=jnp.float32).at[:, 0].set(POS)

        def step(v, T):
            cand = jnp.minimum(T, W[:, :, v])
            best = jnp.max(cand, axis=1)
            return T.at[:, v].set(best)

        return jax.lax.fori_loop(1, V, step, T0)

    return single_source


def get_greedy_fn(V=DEFAULT_V):
    fn = _CACHE.get(V)
    if fn is None:
        import os

        import jax
        import jax.numpy as jnp
        if os.environ.get("ALETSCH_PALLAS_GREEDY") == "1":
            # Pallas v2 backend: bit-identical to the XLA scan and equally
            # dispatch-floor-bound at production shapes (~0.03 ms for
            # [64,64,64] on the tunneled chip; docs/DESIGN.md "pallas").
            # Kept selectable rather than default: same measured speed,
            # one less compiler dependency on the default path.
            from .pallas_kernels import get_greedy_pallas_fn
            fn = get_greedy_pallas_fn(V)
        else:
            fn = jax.jit(_build(jax, jnp, V))
        _CACHE[V] = fn
    return fn


def single_source_host(W):
    """Numpy oracle for the kernel (tests)."""
    W = np.asarray(W, dtype=np.float32)
    B, V, _ = W.shape
    T = np.full((B, V), NEG, dtype=np.float32)
    T[:, 0] = POS
    for v in range(1, V):
        cand = np.minimum(T, W[:, :, v])
        T[:, v] = cand.max(axis=1)
    return T


class DeviceGreedy:
    """Reusable pinned-shape batch solver with dispatch statistics."""

    def __init__(self, batch=DEFAULT_B, maxv=DEFAULT_V):
        self.batch = batch
        self.maxv = maxv
        self.W = np.full((batch, maxv, maxv), NEG, dtype=np.float32)
        self.fn = get_greedy_fn(maxv)
        self.stats = {"dispatches": 0, "graphs": 0, "device_time": 0.0}
        # one warm-up dispatch so the compile happens before timing
        import jax.numpy as jnp
        self.fn(jnp.asarray(self.W)).block_until_ready()

    def row(self, i):
        """Writable [maxv, maxv] slice for the native export to fill."""
        return self.W[i]

    def solve(self, nrows):
        """Tables for the first nrows batch slots: [nrows, maxv] f32."""
        import time

        import jax.numpy as jnp
        t0 = time.perf_counter()
        # ascontiguousarray: the native consumer reads each table row via
        # raw ctypes.data; the relay backend can hand back non-C-contiguous
        # device views (TPU tiled layout, see ops/bridge_topk.py)
        out = np.ascontiguousarray(self.fn(jnp.asarray(self.W)))
        self.stats["device_time"] += time.perf_counter() - t0
        self.stats["dispatches"] += 1
        self.stats["graphs"] += nrows
        return out[:nrows]

    def reset_rows(self, nrows):
        self.W[:nrows] = NEG
