"""Fused greedy decomposition drain: one device dispatch per wave round.

The reference's greedy loop (scallop/scallop.cc:2874-2897 over
rnacore/splice_graph.cc:819-885) is repeat-until-drained: {bottleneck DP ->
argmax backtrace -> subtract the bottleneck along the path (split_merge_path,
scallop.cc:2217-2240 via split_edge :2433-2484)} while the best path weight
exceeds min_transcript_coverage.  The round-2 device path paused at every
extraction (one dispatch per path); this kernel runs the WHOLE drain for a
[B, V, V] batch inside one `lax.while_loop` dispatch and returns packed
path tables, so one dispatch amortizes across every extraction of every
graph in the wave (VERDICT r2 #1).

Exactness model
---------------
The drain is pure {subtract, min, max, compare} over f64 edge weights plus
integer tie-breaks:

- dtype is float64 (scoped `jax.enable_x64()`); on backends whose f64 is
  IEEE-exact (XLA:CPU -- the virtual test mesh and the multichip dryrun)
  every arithmetic result is bit-identical to the native host drain, so the
  returned paths ARE the host paths ("trust mode").
- argmax ties reproduce the host rule `ww >= max_abd` over the in-edge list
  (core_base.h compute_maximum_st_path_w; splice_graph.cc:845-851: the
  LAST list entry achieving the max wins) via the exported P matrix:
  P[u, v] = position of edge u->v in vin[v]'s iteration order.  List
  removals keep relative order, and all edges added during a drain are
  transient within one extraction (split_edge's w-part and the merge
  super-edges are removed before the next DP), so one export stays valid
  for the whole drain.
- On backends with emulated, non-IEEE f64 (this relay-attached TPU chip:
  measured bit-divergent for sub/min/max), `device_f64_exact()` returns
  False and the native consumer runs in "verify mode": the host drain is
  authoritative and device paths are only compared for agreement stats --
  output bytes never depend on device arithmetic.

Either way the native side finishes with greedy_finish_host(), whose DP
re-checks the drained state, so a device that stops early (MAXP cap) or
diverges mid-drain degrades to the host result, never to wrong bytes.
"""

from __future__ import annotations

import os

import numpy as np

NEG = -1.0e18
POS = 1.0e18

DEFAULT_B = 64     # graphs per dispatch
DEFAULT_V = 64     # padded vertex count (matches ops/greedy_dp.py)
DEFAULT_P = 64     # max extractions returned per graph (>= E suffices:
                   # every extraction removes the bottleneck edge)

_CACHE = {}
_EXACT = None


def device_f64_exact():
    """True when the active backend's f64 {sub, min, max} round-trips and
    computes bit-identically to host IEEE f64 (deterministic battery).
    Chooses trust vs verify mode for the fused consumer."""
    global _EXACT
    env = os.environ.get("ALETSCH_FUSED_TRUST")
    if env is not None:
        return env == "1"
    if _EXACT is None:
        try:
            import jax
            import jax.numpy as jnp
            rng = np.random.default_rng(12345)
            a = rng.random(512) * 1000.0
            b = rng.random(512) * 997.0
            with jax.enable_x64():
                f = jax.jit(lambda x, y: jnp.minimum(
                    jnp.maximum(x - y, y - x) - y, x - 0.01))
                dev = np.asarray(f(jnp.asarray(a), jnp.asarray(b)))
            host = np.minimum(np.maximum(a - b, b - a) - b, a - 0.01)
            _EXACT = bool(np.array_equal(dev.view(np.int64),
                                         host.view(np.int64)))
        except Exception:
            _EXACT = False
    return _EXACT


def _build(jax, jnp, B, V, MAXP):
    lax = jax.lax
    barange = jnp.arange(B)
    varange = jnp.arange(V, dtype=jnp.int32)

    def drain(W, P, sink, mincov, guard, smin):
        """W [B,V,V] f64 topo-space adjacency (NEG absent); P [B,V,V] i32
        in-edge list positions (-1 absent); sink [B] i32 topo position of
        the sink (0 = inactive row); mincov/guard/smin [B] f64 per-graph
        cfg scalars.  Returns (paths [B,MAXP,V] bool, ws [B,MAXP] f64,
        npaths [B] i32)."""
        paths0 = jnp.zeros((B, MAXP, V), dtype=jnp.bool_)
        ws0 = jnp.zeros((B, MAXP), dtype=jnp.float64)
        np0 = jnp.zeros((B,), dtype=jnp.int32)
        act0 = sink > 0
        it0 = jnp.int32(0)

        def cond(st):
            _, _, _, _, act, it = st
            return jnp.logical_and(jnp.any(act), it < MAXP)

        def body(st):
            W, paths, ws, npc, act, it = st

            # forward bottleneck DP (splice_graph.cc:819-843)
            T0 = jnp.full((B, V), NEG, dtype=jnp.float64).at[:, 0].set(POS)

            def fstep(v, T):
                cand = jnp.minimum(T, W[:, :, v])
                return T.at[:, v].set(jnp.max(cand, axis=1))

            T = lax.fori_loop(1, V, fstep, T0)
            wsink = jnp.take_along_axis(T, sink[:, None], axis=1)[:, 0]
            # continue iff reachable and w > min_transcript_coverage
            # (scallop.cc:2884-2888)
            ok = act & (wsink >= 0.0) & (wsink > mincov)

            # backtrace (splice_graph.cc:845-858 parent rule: ww >= best
            # scanning vin order == max cand, ties to the largest P)
            x0 = jnp.where(ok, sink, 0)
            pm0 = jnp.zeros((B, V), dtype=jnp.bool_).at[:, 0].set(ok)
            pr0 = jnp.full((B, V), -1, dtype=jnp.int32)

            def bstep(i, c):
                x, pm, pr = c
                walking = ok & (x != 0)
                pm = pm.at[barange, x].set(pm[barange, x] | walking)
                Wcol = jnp.take_along_axis(
                    W, x[:, None, None], axis=2)[:, :, 0]       # [B,V]
                Pcol = jnp.take_along_axis(
                    P, x[:, None, None], axis=2)[:, :, 0]
                valid = (Wcol >= 0.0) & (T >= 0.0)
                cand = jnp.where(valid, jnp.minimum(T, Wcol), NEG)
                best = jnp.max(cand, axis=1, keepdims=True)
                score = jnp.where(valid & (cand == best), Pcol, -1)
                u = jnp.argmax(score, axis=1).astype(jnp.int32)
                pr = pr.at[barange, x].set(jnp.where(walking, u,
                                                     pr[barange, x]))
                x = jnp.where(walking, u, x)
                return x, pm, pr

            _, pm, pr = lax.fori_loop(0, V, bstep, (x0, pm0, pr0))

            # subtract the bottleneck along the path (split_edge
            # scallop.cc:2433-2484: |ww-w| <= SMIN removes the edge, else
            # remainder = ww - w floored at min_guaranteed_edge_weight)
            emask = pr[:, None, :] == varange[None, :, None]    # [B,u,v]
            wb = wsink[:, None, None]
            diff = W - wb
            rem = jnp.where(jnp.abs(diff) <= smin[:, None, None], NEG,
                            jnp.where(diff <= guard[:, None, None],
                                      guard[:, None, None], diff))
            W = jnp.where(emask, rem, W)

            # record
            paths = paths.at[barange, npc].set(
                jnp.where(ok[:, None], pm, paths[barange, npc]))
            ws = ws.at[barange, npc].set(jnp.where(ok, wsink,
                                                   ws[barange, npc]))
            npc = npc + ok.astype(jnp.int32)
            return W, paths, ws, npc, ok, it + 1

        _, paths, ws, npc, _, _ = lax.while_loop(
            cond, body, (W, paths0, ws0, np0, act0, it0))
        return paths, ws, npc

    return drain


def get_fused_fn(B=DEFAULT_B, V=DEFAULT_V, MAXP=DEFAULT_P):
    key = (B, V, MAXP)
    fn = _CACHE.get(key)
    if fn is None:
        import jax
        with jax.enable_x64():
            import jax.numpy as jnp
            fn = jax.jit(_build(jax, jnp, B, V, MAXP))
        _CACHE[key] = fn
    return fn


def drain_host(W, P, sink, mincov, guard, smin, maxp=DEFAULT_P):
    """Numpy oracle with identical semantics (tests pin kernel == this ==
    the native host drain)."""
    W = np.array(W, dtype=np.float64, copy=True)
    P = np.asarray(P)
    B, V, _ = W.shape
    paths = np.zeros((B, maxp, V), dtype=bool)
    ws = np.zeros((B, maxp), dtype=np.float64)
    npaths = np.zeros(B, dtype=np.int32)
    for b in range(B):
        if sink[b] <= 0:
            continue
        for _ in range(maxp):
            T = np.full(V, NEG)
            T[0] = POS
            for v in range(1, V):
                T[v] = np.minimum(T, W[b, :, v]).max()
            w = T[sink[b]]
            if w < 0.0 or w <= mincov[b]:
                break
            x = int(sink[b])
            pm = np.zeros(V, dtype=bool)
            pm[0] = True
            edges = []
            while x != 0:
                pm[x] = True
                valid = (W[b, :, x] >= 0.0) & (T >= 0.0)
                cand = np.where(valid, np.minimum(T, W[b, :, x]), NEG)
                best = cand.max()
                score = np.where(valid & (cand == best), P[b, :, x], -1)
                u = int(score.argmax())
                edges.append((u, x))
                x = u
            for (u, v) in edges:
                d = W[b, u, v] - w
                if abs(W[b, u, v] - w) <= smin[b]:
                    W[b, u, v] = NEG
                elif d <= guard[b]:
                    W[b, u, v] = guard[b]
                else:
                    W[b, u, v] = d
            k = npaths[b]
            paths[b, k] = pm
            ws[b, k] = w
            npaths[b] += 1
    return paths, ws, npaths


def _pallas_drain_wanted():
    """The f32 Pallas form (ops/pallas_drain.py) replaces the XLA f64
    while_loop on the TPU backend: measured ~2 us/graph resident vs
    39 us/graph for the f64 form and 11 us/graph for the native host
    drain (round-5; BENCH pallas_drain_crossover).  Off on CPU (tests
    keep the XLA form; interpret mode would be pure overhead) unless
    forced with ALETSCH_PALLAS_DRAIN=1; =0 disables everywhere."""
    env = os.environ.get("ALETSCH_PALLAS_DRAIN")
    if env is not None:
        return env != "0"
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:
        return False


class DeviceGreedyFused:
    """Pinned-shape fused drain solver: the native export fills rows, one
    solve() dispatch drains every exported graph completely."""

    def __init__(self, batch=DEFAULT_B, maxv=DEFAULT_V, maxp=DEFAULT_P):
        self.batch = batch
        self.maxv = maxv
        self.maxp = maxp
        self.W = np.full((batch, maxv, maxv), NEG, dtype=np.float64)
        self.P = np.full((batch, maxv, maxv), -1, dtype=np.int32)
        self.sink = np.zeros(batch, dtype=np.int32)
        self.scal = np.zeros((batch, 3), dtype=np.float64)
        self.pallas_fn = None
        self.last_trust = None     # per-solve trust hint (Pallas form)
        if _pallas_drain_wanted():
            try:
                from . import pallas_drain
                self.pallas_fn = pallas_drain.get_pallas_drain_fn(
                    batch, maxv, maxp)
            except Exception:              # pragma: no cover
                self.pallas_fn = None
        self.fn = None if self.pallas_fn is not None \
            else get_fused_fn(batch, maxv, maxp)
        self.stats = {"fused_dispatches": 0, "fused_graphs": 0,
                      "fused_device_time": 0.0, "fused_paths": 0,
                      "fused_form": "pallas_f32"
                      if self.pallas_fn is not None else "xla_f64"}
        self._solve(0)          # warm-up compile before timing

    def row(self, i):
        """Writable (W, P, sink, scal) slices for the native export."""
        return self.W[i], self.P[i], self.sink[i:i + 1], self.scal[i]

    def _solve(self, nrows):
        import jax

        from .meshing import account_out, shard_args
        self.sink[nrows:] = 0    # stale slots stay inactive
        if self.pallas_fn is not None:
            try:
                return self._solve_pallas(nrows)
            except Exception:              # pragma: no cover
                # Mosaic unavailable at this shape: permanent fallback
                self.pallas_fn = None
                self.last_trust = None
                self.fn = get_fused_fn(self.batch, self.maxv, self.maxp)
                self.stats["fused_form"] = "xla_f64"
        with jax.enable_x64():
            import jax.numpy as jnp
            args = [jnp.asarray(self.W), jnp.asarray(self.P),
                    jnp.asarray(self.sink),
                    jnp.asarray(np.ascontiguousarray(self.scal[:, 0])),
                    jnp.asarray(np.ascontiguousarray(self.scal[:, 1])),
                    jnp.asarray(np.ascontiguousarray(self.scal[:, 2]))]
            # multi-device: shard the live wave batch over the ('b',) mesh
            args, _ = shard_args(args, [], self.stats)
            paths, ws, npaths = self.fn(*args)
            npaths.block_until_ready()
        account_out((paths, ws, npaths), self.stats)
        # ascontiguousarray: the relay backend exposes device buffers as
        # non-C-contiguous numpy views (TPU tiled layout) and the native
        # consumer reads rows via raw ctypes.data (see ops/bridge_topk.py)
        return (np.ascontiguousarray(paths), np.ascontiguousarray(ws),
                np.ascontiguousarray(npaths))

    def _solve_pallas(self, nrows):
        """f32 Pallas form: per-solve trust = every live weight is an
        integer < 2^24, where f32 arithmetic is bit-exact vs the f64
        host (ops/pallas_drain.py exactness model); otherwise the
        consumer runs in verify mode and the host result is
        authoritative, byte-identical either way."""
        from . import pallas_drain
        paths, ws, npaths = pallas_drain.drain_pallas(
            self.W, self.P, self.sink,
            np.ascontiguousarray(self.scal[:, 0]),
            np.ascontiguousarray(self.scal[:, 1]),
            np.ascontiguousarray(self.scal[:, 2]),
            maxp=self.maxp, fn=self.pallas_fn)
        self.last_trust = nrows == 0 or \
            pallas_drain.integer_exact(self.W[:nrows])
        return paths, ws.astype(np.float64), npaths

    def solve(self, nrows):
        """(paths [n,MAXP,V] bool, ws [n,MAXP] f64, npaths [n] i32)."""
        import time
        t0 = time.perf_counter()
        paths, ws, npaths = self._solve(nrows)
        self.stats["fused_device_time"] += time.perf_counter() - t0
        self.stats["fused_dispatches"] += 1
        self.stats["fused_graphs"] += nrows
        self.stats["fused_paths"] += int(npaths[:nrows].sum())
        return paths[:nrows], ws[:nrows], npaths[:nrows]
