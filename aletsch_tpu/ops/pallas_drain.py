"""Pallas fused greedy-drain kernel: the WHOLE repeat-until-drained loop
(scallop/scallop.cc:2874-2897 over rnacore/splice_graph.cc:819-885) as one
f32 TPU kernel with VMEM-resident state.

This is the round-4 verdict's item 1: the measured unlock for on-chip
wins was "reduce the kernels' serialized rounds ~4x (f32/Pallas sublane
forms)".  Three structural changes vs the XLA while_loop form
(ops/greedy_fused.py):

1. f32 instead of emulated f64 — this chip has no native f64; every
   f64 min/max/sub in the XLA kernel expands to multi-op VPU emulation.
2. Parent tracking FUSED into the forward DP: the backtrace recomputes
   exactly the forward step's candidate set (same T, same W column, same
   tie rule "max in-edge-list position P among cand == best"), so the
   parent one-hot can be recorded during the forward sweep — the
   per-round serialized step count halves (V instead of 2V), and the
   walk becomes V cheap mask steps with no DP recompute.
3. All state (W copy, parent one-hots, T) lives in VMEM scratch across
   the whole multi-round drain: zero HBM round-trips between rounds, no
   XLA op-dispatch overhead per DP step.

Exactness model: bit-exact vs the f64 host drain whenever every edge
weight is an integer < 2^24 (then every sub/min/max stays in the
integer domain where f32 == f64, and the guard-floor branch — the only
source of non-representable constants — never fires: an integer
remainder <= guard=0.01 means remainder == 0, which the SMIN branch
removes first).  `integer_exact(W)` gates trust mode per batch; the
synthetic crossover batches satisfy it, production batches that don't
run in verify mode exactly like the XLA form on non-IEEE backends
(native consumer re-checks, bytes never depend on device arithmetic).

Dynamic-indexing constraints (CLAUDE.md): the chip rejects dynamic LANE
indexing; every per-vertex access here is a dynamic SUBLANE slice
(pl.ds on dim 1 of [tile, V, V] refs) or a lane-iota mask.
"""

from __future__ import annotations

import numpy as np

NEGF = np.float32(-1.0e18)
POSF = np.float32(1.0e18)

DEFAULT_B = 64
DEFAULT_V = 64
DEFAULT_P = 64

_CACHE = {}


def pallas_available():
    try:
        from jax.experimental import pallas  # noqa: F401
        return True
    except Exception:
        return False


def integer_exact(W, limit=float(1 << 24)):
    """True when every finite weight is a non-negative integer < 2^24 —
    the regime where the f32 drain is bit-exact vs the f64 host."""
    W = np.asarray(W)
    act = W >= 0.0
    vals = W[act]
    if vals.size == 0:
        return True
    return bool(np.all(vals < limit) and np.all(vals == np.floor(vals)))


def _build(interpret, B, V, MAXP, tile):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    lax = jax.lax

    def kernel(wt_ref, pt_ref, sink_ref, mc_ref, gd_ref, sm_ref,
               paths_ref, ws_ref, np_ref, W_s):
        # Mask algebra is f32 0/1 arithmetic: Mosaic rejects relayouts
        # that broadcast i1 vectors across a non-singleton dim, so i1
        # only ever appears as full-shape elementwise predicates.
        lane = lax.broadcasted_iota(jnp.int32, (tile, V), 1)
        rounds = lax.broadcasted_iota(jnp.int32, (MAXP, tile, V), 0)
        wlanes = lax.broadcasted_iota(jnp.int32, (tile, MAXP), 1)
        slab_io = lax.broadcasted_iota(jnp.int32, (tile, 8, V), 1)
        W_s[:, :, :] = wt_ref[:, :, :]
        sinkf = sink_ref[:, :]                              # f32 one-hot
        sinkoh = sinkf > 0.0                                # (tile, V) i1
        mincov = mc_ref[:, :]                               # (tile, 1)
        guard = gd_ref[:, :]
        smin = sm_ref[:, :]
        act0 = jnp.max(sinkf, axis=1, keepdims=True)        # (tile, 1)

        # parent one-hot (f32) of vertex v from the round's T: exactly
        # the host backtrace rule (splice_graph.cc:845-858 — max in-edge
        # position P among cand == best; P unique per column).  Valid in
        # the walk too: row v is only modified AFTER its uoh is read,
        # and parents precede children in topo space.
        def parent_oh(roww, prow, T):
            valid = (roww >= 0.0) & (T >= 0.0)              # full-shape
            cand = jnp.where(valid, jnp.minimum(T, roww), NEGF)
            m = jnp.max(cand, axis=1, keepdims=True)        # (tile, 1)
            score = jnp.where(valid & (cand == m), prow, jnp.int32(-1))
            ms = jnp.max(score, axis=1, keepdims=True)
            okm = (ms >= 0).astype(jnp.float32)             # (tile, 1)
            return (score == ms).astype(jnp.float32) * okm

        def cond(c):
            act = c[0]
            it = c[2]
            return jnp.logical_and(jnp.any(act > 0.0), it < MAXP)

        def body(c):
            act, npc, it, paths_c, ws_c = c

            # forward bottleneck DP (splice_graph.cc:819-843)
            T0 = jnp.where(lane == 0, POSF, NEGF)

            def fwd(v, T):
                row = W_s[:, pl.ds(v, 1), :][:, 0, :]
                cand = jnp.where((row >= 0.0) & (T >= 0.0),
                                 jnp.minimum(T, row), NEGF)
                m = jnp.max(cand, axis=1, keepdims=True)
                return jnp.where(lane == v, m, T)

            T = lax.fori_loop(1, V, fwd, T0)
            wsink = jnp.max(jnp.where(sinkoh, T, NEGF), axis=1,
                            keepdims=True)                  # (tile, 1)
            ok = (act * (wsink >= 0.0).astype(jnp.float32)
                  * (wsink > mincov).astype(jnp.float32))   # (tile, 1)

            # path walk + bottleneck subtraction, v descending (parents
            # precede children in topo space); fire marks edge
            # (parent[v], v); split_edge semantics scallop.cc:2433-2484.
            # Stores are 8-sublane-aligned slab read-modify-writes (the
            # chip cannot prove unaligned dynamic sublane stores safe).
            onp0 = sinkf * ok                               # (tile, V)

            def bwd(i, onp):
                v = V - 1 - i
                v8 = pl.multiple_of((v // 8) * 8, 8)
                rowsel = slab_io == (v - v8)                # full-shape
                slab = W_s[:, pl.ds(v8, 8), :]
                roww = jnp.max(jnp.where(rowsel, slab, NEGF), axis=1)
                prow = pt_ref[:, pl.ds(v, 1), :][:, 0, :]
                selv = jnp.max(jnp.where(lane == v, onp, 0.0),
                               axis=1, keepdims=True)       # (tile, 1)
                fire = parent_oh(roww, prow, T) * selv * ok
                diff = roww - wsink
                rem = jnp.where(jnp.abs(diff) <= smin, NEGF,
                                jnp.where(diff <= guard, guard, diff))

                @pl.when(jnp.any(fire > 0.0))
                def _():
                    mask3 = (rowsel.astype(jnp.float32)
                             * fire[:, None, :])
                    W_s[:, pl.ds(v8, 8), :] = jnp.where(
                        mask3 > 0.0, rem[:, None, :], slab)

                return jnp.maximum(onp, fire)

            onp = lax.fori_loop(0, V - 1, bwd, onp0)

            # record at round row `it`: npc == it for every still-active
            # graph (graphs never reactivate), so a shared row is exact
            rec8 = (onp > 0.0).astype(jnp.int8)             # ok-gated
            paths_c = jnp.where(rounds == it, rec8[None, :, :], paths_c)
            ws_c = ws_c + ((wlanes == it).astype(jnp.float32)
                           * (ok * wsink))
            return (ok, npc + ok.astype(jnp.int32), it + 1,
                    paths_c, ws_c)

        _act, npc, _it, paths_c, ws_c = lax.while_loop(
            cond, body,
            (act0, jnp.zeros((tile, 1), jnp.int32), jnp.int32(0),
             jnp.zeros((MAXP, tile, V), jnp.int8),
             jnp.zeros((tile, MAXP), jnp.float32)))
        paths_ref[:, :, :] = paths_c
        ws_ref[0, :, :] = ws_c
        np_ref[0, :, :] = npc

    grid = (B // tile,)

    @jax.jit
    def run(Wt, Pt, sinkoh, mincov, guard, smin):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, V, V), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, V, V), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, V), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 1), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 1), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 1), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((MAXP, tile, V), lambda b: (0, b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, MAXP), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, 1), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((MAXP, B, V), jnp.int8),
                jax.ShapeDtypeStruct((B // tile, tile, MAXP),
                                     jnp.float32),
                jax.ShapeDtypeStruct((B // tile, tile, 1), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((tile, V, V), jnp.float32),
            ],
            interpret=interpret,
        )(Wt, Pt, sinkoh, mincov, guard, smin)

    return run


def get_pallas_drain_fn(B=DEFAULT_B, V=DEFAULT_V, MAXP=DEFAULT_P,
                        tile=8, interpret=None):
    import jax
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    key = (B, V, MAXP, tile, bool(interpret))
    fn = _CACHE.get(key)
    if fn is None:
        fn = _build(interpret, B, V, MAXP, tile)
        _CACHE[key] = fn
    return fn


def drain_pallas(W, P, sink, mincov, guard, smin, maxp=DEFAULT_P,
                 interpret=None, device_args=None, fn=None):
    """Drop-in for ops/greedy_fused.drain_host on f32-exact inputs:
    (paths [B,maxp,V] bool, ws [B,maxp] f32, npaths [B] i32).

    device_args: optional pre-placed device arrays (resident-timing
    path); otherwise numpy inputs are converted per call."""
    import jax
    import jax.numpy as jnp
    B, V, _ = np.asarray(W).shape
    if fn is None:
        fn = get_pallas_drain_fn(B, V, maxp, interpret=interpret)
    if device_args is None:
        device_args = prep_args(W, P, sink, mincov, guard, smin)
    paths, ws, npc = fn(*device_args)
    paths = np.ascontiguousarray(paths).astype(bool).transpose(1, 0, 2)
    # ws arrives (G, tile, MAXP): graph b = g*tile + j -> row [b]
    ws = np.ascontiguousarray(ws).reshape(B, maxp)
    npc = np.ascontiguousarray(npc).reshape(-1)[:B]
    return paths, ws, npc


def prep_args(W, P, sink, mincov, guard, smin):
    """Transpose + cast the fused-drain export buffers into the kernel's
    layouts (host-side numpy; ~2 MB at the bench shape)."""
    import jax.numpy as jnp
    W = np.asarray(W)
    B, V, _ = W.shape
    Wt = np.ascontiguousarray(W.transpose(0, 2, 1), dtype=np.float32)
    Pt = np.ascontiguousarray(
        np.asarray(P).transpose(0, 2, 1), dtype=np.int32)
    sinkoh = np.zeros((B, V), dtype=np.float32)
    sk = np.asarray(sink).astype(np.int64)
    rows = np.nonzero(sk > 0)[0]
    sinkoh[rows, sk[rows]] = 1
    mc = np.asarray(mincov, dtype=np.float32).reshape(B, 1)
    gd = np.asarray(guard, dtype=np.float32).reshape(B, 1)
    sm = np.asarray(smin, dtype=np.float32).reshape(B, 1)
    return [jnp.asarray(x) for x in (Wt, Pt, sinkoh, mc, gd, sm)]
