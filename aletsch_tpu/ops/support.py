"""Wave-batched cross-sample junction-support reduce.

The meta assembler stamps every splicing edge of a group's graphs with its
cross-sample abundance sum (meta/assembler.cc:375-417 `ei.abd += sum` over
the per-sample support map; host paths: aletsch_tpu/meta/assembler.py
junction_support and native/core.cpp GroupAssembler::junction_support).
This kernel computes all of a region wave's per-junction sums in one
device dispatch: jw [B, NS, J] holds each group's per-(sample-slot,
junction) weights and the reduce is a sample-axis sum — the cross-sample
communication pattern SURVEY §2.8 maps to a mesh all-reduce (the sharded
composite lives in parallel/mesh.py; this is the pinned-shape production
form dispatched by meta/device_wave.py).

Bit-exactness: the native export (core.cpp GroupRun::support_export) gates
each junction on non-negative integral weights with an f32-exact total
(sum of <= NS integers bounded by max*NS < 2^24), so the f32 sum equals
the host's sorted-key f64 sum regardless of reduction order; gate-failing
junctions keep the host sum.
"""

from __future__ import annotations

import numpy as np

DEFAULT_B = 64    # groups per dispatch
DEFAULT_NS = 16   # padded sample slots (larger support maps stay on host)
DEFAULT_J = 64    # padded junctions per group (overflow stays on host)

_CACHE = {}


def get_support_fn(NS=DEFAULT_NS, J=DEFAULT_J):
    key = (NS, J)
    fn = _CACHE.get(key)
    if fn is None:
        import jax
        import jax.numpy as jnp

        def support_sum(jw):
            """jw: [B, NS, J] -> [B, J] sample-axis sums."""
            return jnp.sum(jw, axis=1)

        fn = jax.jit(support_sum)
        _CACHE[key] = fn
    return fn


def support_sum_host(jw):
    """Numpy oracle (tests)."""
    return np.asarray(jw, dtype=np.float32).sum(axis=1)


class DeviceSupport:
    """Reusable pinned-shape batch reducer for production wave support
    (meta/device_wave.py)."""

    def __init__(self, batch=DEFAULT_B, maxs=DEFAULT_NS, maxj=DEFAULT_J):
        self.batch = batch
        self.maxs = maxs
        self.maxj = maxj
        self.jw = np.zeros((batch, maxs, maxj), dtype=np.float32)
        self.fn = get_support_fn(maxs, maxj)
        self.stats = {"support_dispatches": 0, "support_groups": 0,
                      "support_device_time": 0.0}
        import jax.numpy as jnp
        self.fn(jnp.asarray(self.jw)).block_until_ready()   # warm-up

    def row(self, i):
        """Writable [maxs, maxj] slice for the native export."""
        return self.jw[i]

    def solve(self, nrows):
        """[nrows, maxj] f32 per-junction sums."""
        import time

        import jax.numpy as jnp

        from .meshing import account_out, shard_args
        t0 = time.perf_counter()
        args, _ = shard_args([jnp.asarray(self.jw)], [], self.stats)
        out = self.fn(*args)
        account_out((out,), self.stats)
        # ascontiguousarray: rows feed native support_step via raw
        # ctypes.data (non-C-contiguous relay views, see ops/bridge_topk.py)
        out = np.ascontiguousarray(out)
        self.stats["support_device_time"] += time.perf_counter() - t0
        self.stats["support_dispatches"] += 1
        self.stats["support_groups"] += nrows
        return out[:nrows]
