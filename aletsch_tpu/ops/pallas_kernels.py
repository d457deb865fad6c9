"""Pallas TPU kernels for the assembler's hot numeric loops.

bottleneck_from_source: for a batch of padded splice graphs (dense
upper-triangular adjacency, genome order = topological order), compute
T[v] = best min-edge weight over source->v paths — the score both the
bridging DP (top-1 stack entry) and the greedy max-path extraction maximize.
One grid program per bundle tile; W lives in VMEM; the DP is a sequential
fori_loop over target vertices.

Two tilings (the chip rejects dynamic indexing of the lane/last dim):

- v1 (`_kernel_tile`): lane-mask column select — O(V^2) VPU work per DP
  step; kept as the measured baseline.
- v2 (`_kernel_tile_v2`): the adjacency is pre-transposed so the per-step
  column read W[:, v] becomes a SUBLANE dynamic slice WT[v, :] — O(V) per
  step, V-fold less VPU work.  This is the production variant
  (`bottleneck_from_source_pallas` dispatches to it).

Falls back to the XLA version (ops.bridge_dp) when Pallas is unavailable;
interpret mode is used on CPU so tests exercise the same kernel bodies.
"""

from __future__ import annotations

import numpy as np

from .bridge_dp import NEG, POS

_CACHE = {}


def _kernel_tile(interpret, tile=8):
    """One grid program handles `tile` bundles; the DP step vectorizes the
    (tile, V) min/max across bundles on the VPU."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(W_ref, T_ref):
        V = W_ref.shape[2]
        src_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, V), 1)
        T_ref[:, :] = jnp.where(src_iota == 0, POS, NEG)
        lane3 = jax.lax.broadcasted_iota(jnp.int32, (tile, V, V), 2)
        Wm = jnp.where(W_ref[:, :, :] > 0, W_ref[:, :, :], NEG)

        def body(v, _):
            # select column v of W via a lane mask (no dynamic indexing)
            col = jnp.max(jnp.where(lane3 == v, Wm, NEG), axis=2)  # (tile, V)
            cand = jnp.minimum(T_ref[:, :], col)
            best = jnp.max(cand, axis=1)                           # (tile,)
            upd = jnp.maximum(T_ref[:, :], best[:, None])
            T_ref[:, :] = jnp.where(src_iota == v, upd, T_ref[:, :])
            return 0

        jax.lax.fori_loop(1, V, body, 0)

    @jax.jit
    def run(W):
        B, V, _ = W.shape
        return pl.pallas_call(
            kernel,
            grid=(B // tile,),
            in_specs=[pl.BlockSpec((tile, V, V), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tile, V), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, V), jnp.float32),
            interpret=interpret,
        )(W)

    return run


def _kernel_tile_v2(interpret, tile=8, neg_form=False):
    """v2: O(V) column select.  The jitted wrapper transposes W to
    WT[b, t, s] = W[b, s, t] (a cheap XLA transpose), so the DP step reads
    the in-weights of vertex v as the SUBLANE slice WT[:, v, :] — dynamic
    sublane indexing is supported on this chip where dynamic lane indexing
    is not (CLAUDE.md / ops lessons).  neg_form=True takes the adjacency
    in ops/greedy_dp.py's convention (absent = NEG, zero-weight edges
    honored) and is bit-identical to its XLA scan — the drop-in form
    DeviceGreedy selects with ALETSCH_PALLAS_GREEDY=1."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(WT_ref, T_ref):
        V = WT_ref.shape[2]
        src_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, V), 1)
        T_ref[:, :] = jnp.where(src_iota == 0, POS, NEG)

        def body(v, _):
            col = WT_ref[:, pl.ds(v, 1), :][:, 0, :]          # (tile, V)
            if neg_form:
                colm = col
            else:
                colm = jnp.where(col > 0, col, NEG)
            cand = jnp.minimum(T_ref[:, :], colm)
            best = jnp.max(cand, axis=1)                      # (tile,)
            upd = jnp.maximum(T_ref[:, :], best[:, None])
            T_ref[:, :] = jnp.where(src_iota == v, upd, T_ref[:, :])
            return 0

        jax.lax.fori_loop(1, V, body, 0)

    @jax.jit
    def run(W):
        B, V, _ = W.shape
        WT = jnp.swapaxes(W, 1, 2)
        return pl.pallas_call(
            kernel,
            grid=(B // tile,),
            in_specs=[pl.BlockSpec((tile, V, V), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tile, V), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, V), jnp.float32),
            interpret=interpret,
        )(WT)

    return run


def get_greedy_pallas_fn(V, interpret=None, tile=16):
    """NEG-form batched bottleneck DP (drop-in for
    ops/greedy_dp.get_greedy_fn; batch must be a multiple of tile —
    DeviceGreedy's pinned batch of 64 is)."""
    import jax
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    key = ("greedy", tile, bool(interpret))
    if key not in _CACHE:
        _CACHE[key] = _kernel_tile_v2(interpret, tile, neg_form=True)
    return _CACHE[key]


def bottleneck_from_source_pallas(W, interpret=None, version=2):
    """T[b, v] = bottleneck score of best 0->v path; NEG if unreachable."""
    import jax
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    W = np.asarray(W, dtype=np.float32)
    tile = 8
    B = W.shape[0]
    pad = (-B) % tile
    if pad:
        W = np.concatenate([W, np.zeros((pad,) + W.shape[1:], W.dtype)])
    key = ("tile", tile, bool(interpret), version)
    if key not in _CACHE:
        build = _kernel_tile_v2 if version == 2 else _kernel_tile
        _CACHE[key] = build(interpret, tile)
    out = _CACHE[key](W)
    return out[:B] if pad else out


def pallas_available():
    try:
        from jax.experimental import pallas  # noqa: F401
        return True
    except Exception:
        return False
