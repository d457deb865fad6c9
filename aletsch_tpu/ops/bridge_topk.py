"""Wave-batched top-K bridging DP with min-edge stacks and backtrace.

Device version of the bridging dynamic program (bridge/bridge_solver.cc:
484-568; host paths: aletsch_tpu/bridge/solver.py _dynamic_programming and
native/core_solve.h BridgeSolver::dynamic_programming).  Each DP instance is
one (source-run, strand) program over the topo-ordered splice graph window
[k1, k2]: per vertex it keeps the best ``K = bridge_dp_solution_size`` (10)
entries, each ranked by an ascending ``S = bridge_dp_stack_size`` (5) stack
of the smallest edge weights along the path (lexicographic bottleneck
comparison, larger first), tie-broken by shorter accumulated vertex length,
then by host candidate enumeration order.

Bit-exactness with the host DP:

- Edge weights are ints (the host truncates the double weight); stack
  values can never exceed the 999999 sentinel (update_stack only inserts
  values strictly smaller than an existing element), so clamping exported
  weights to 999999 is exact and i32 keys reproduce the host compare.
- Candidates are enumerated (in-edge slot, entry index) with the in-edge
  slots exported in the host's in-edge list order, and ``lax.sort`` is
  stable — equal-key survivors match the host's stable top-K selection
  element for element.

Layout per batch row (padded; -1 = absent):

- P   [V, E] i32   predecessor (topo-local) per in-edge slot, host order
- Wt  [V, E] i32   clamped int edge weight for that slot
- Lv  [V]    i32   vertex lengths (rpos - lpos)
- tgt [T]    i32   pier target vertices (topo-local) to read out

Returns stacks at the targets ([B, T, K, S]; entry invalid iff stack[0] < 0)
plus the full parent/entry-index tables ([B, V, K]) for the host backtrace
(bridge_solver.cc:548-568 walks them in microseconds; shipping the tables
is cheaper than shipping every path).
"""

from __future__ import annotations

import numpy as np

K = 10          # bridge_dp_solution_size default (config.py)
S = 5           # bridge_dp_stack_size default
BIG = np.int32(2**30)
SENTINEL = 999999   # initial stack fill (bridge_solver.cc:489)

DEFAULT_B = 64  # instances per dispatch
DEFAULT_V = 64  # padded window size
DEFAULT_E = 16  # max in-degree (host fallback above)
DEFAULT_T = 16  # max targets per instance

_CACHE = {}


def _build(jax, jnp, V, E, T):
    def bridge_dp(P, Wt, Lv, tgt):
        B = P.shape[0]
        N = E * K

        stk0 = jnp.full((B, V, K, S), -1, dtype=jnp.int32)
        stk0 = stk0.at[:, 0, 0, :].set(SENTINEL)
        ln0 = jnp.zeros((B, V, K), dtype=jnp.int32)
        ln0 = ln0.at[:, 0, 0].set(Lv[:, 0])
        par0 = jnp.full((B, V, K), -1, dtype=jnp.int32)
        pix0 = jnp.full((B, V, K), -1, dtype=jnp.int32)
        val0 = jnp.zeros((B, V, K), dtype=jnp.bool_)
        val0 = val0.at[:, 0, 0].set(True)

        pos = jnp.arange(S, dtype=jnp.int32)                    # [S]
        e_id = jnp.broadcast_to(
            jnp.arange(E, dtype=jnp.int32)[None, :, None], (B, E, K)
        ).reshape(B, N)
        i_id = jnp.broadcast_to(
            jnp.arange(K, dtype=jnp.int32)[None, None, :], (B, E, K)
        ).reshape(B, N)

        def step(k, state):
            stk, ln, par, pix, val = state
            p = jax.lax.dynamic_slice_in_dim(P, k, 1, axis=1)[:, 0]   # [B,E]
            w = jax.lax.dynamic_slice_in_dim(Wt, k, 1, axis=1)[:, 0]
            lk = jax.lax.dynamic_slice_in_dim(Lv, k, 1, axis=1)       # [B,1]
            pm = p >= 0
            pc = jnp.where(pm, p, 0)
            idx = jnp.broadcast_to(pc[:, :, None, None], (B, E, K, S))
            gs = jnp.take_along_axis(stk, idx, axis=1)                # [B,E,K,S]
            gl = jnp.take_along_axis(ln, pc[:, :, None], axis=1)      # [B,E,K]
            gv = jnp.take_along_axis(val, pc[:, :, None], axis=1)
            cv = gv & pm[:, :, None]                                  # [B,E,K]

            # insert w into the ascending stack (update_stack): position =
            # count of elements <= w; c >= S leaves the stack unchanged
            wb = w[:, :, None, None]
            c = jnp.sum((gs <= wb).astype(jnp.int32), axis=-1,
                        keepdims=True)                                # [B,E,K,1]
            shifted = jnp.concatenate([gs[..., :1], gs[..., :-1]], axis=-1)
            ns = jnp.where(pos < c, gs,
                           jnp.where(pos == c, wb, shifted))          # [B,E,K,S]
            nl = gl + lk[:, :, None]                                  # [B,E,K]

            ns = ns.reshape(B, N, S)
            nl = nl.reshape(B, N)
            cvf = cv.reshape(B, N)

            keys = [jnp.where(cvf, -ns[:, :, j], BIG) for j in range(S)]
            keys.append(jnp.where(cvf, nl, BIG))
            ops = tuple(keys) + (e_id, i_id, cvf)
            srt = jax.lax.sort(ops, num_keys=S + 1, is_stable=True,
                               dimension=1)
            top = [o[:, :K] for o in srt]
            # operand order: keys[0..S] (stacks + length), e_id, i_id, cvf
            nval = top[S + 3]
            nstk = jnp.where(nval[:, :, None],
                             -jnp.stack(top[:S], axis=-1), -1)        # [B,K,S]
            nln = jnp.where(nval, top[S], 0)
            se = top[S + 1]                                           # [B,K]
            pe = jnp.take_along_axis(p, se, axis=1)
            npar = jnp.where(nval, pe, -1)
            npix = jnp.where(nval, top[S + 2], -1)

            stk = jax.lax.dynamic_update_slice_in_dim(
                stk, nstk[:, None], k, axis=1)
            ln = jax.lax.dynamic_update_slice_in_dim(
                ln, nln[:, None], k, axis=1)
            par = jax.lax.dynamic_update_slice_in_dim(
                par, npar[:, None], k, axis=1)
            pix = jax.lax.dynamic_update_slice_in_dim(
                pix, npix[:, None], k, axis=1)
            val = jax.lax.dynamic_update_slice_in_dim(
                val, nval[:, None], k, axis=1)
            return stk, ln, par, pix, val

        stk, ln, par, pix, val = jax.lax.fori_loop(
            1, V, step, (stk0, ln0, par0, pix0, val0))

        tm = tgt >= 0
        tc = jnp.where(tm, tgt, 0)
        tidx = jnp.broadcast_to(tc[:, :, None, None], (B, T, K, S))
        ostk = jnp.take_along_axis(stk, tidx, axis=1)
        oval = jnp.take_along_axis(val, tc[:, :, None], axis=1) \
            & tm[:, :, None]
        ostk = jnp.where(oval[:, :, :, None], ostk, -1)
        return ostk, par, pix

    return bridge_dp


def get_bridge_fn(V=DEFAULT_V, E=DEFAULT_E, T=DEFAULT_T):
    key = (V, E, T)
    fn = _CACHE.get(key)
    if fn is None:
        import jax
        import jax.numpy as jnp
        fn = jax.jit(_build(jax, jnp, V, E, T))
        _CACHE[key] = fn
    return fn


class DeviceBridge:
    """Reusable pinned-shape batch solver for production wave bridging
    (meta/device_wave.py): one dispatch computes the top-K stack DP for up
    to `batch` pier-DP instances paused across a region wave's groups."""

    def __init__(self, batch=DEFAULT_B, maxv=DEFAULT_V, maxe=DEFAULT_E,
                 maxt=DEFAULT_T):
        self.batch = batch
        self.maxv = maxv
        self.maxe = maxe
        self.maxt = maxt
        self.P = np.full((batch, maxv, maxe), -1, dtype=np.int32)
        self.Wt = np.zeros((batch, maxv, maxe), dtype=np.int32)
        self.Lv = np.zeros((batch, maxv), dtype=np.int32)
        self.tgt = np.full((batch, maxt), -1, dtype=np.int32)
        self.fn = get_bridge_fn(maxv, maxe, maxt)
        self.stats = {"bridge_dispatches": 0, "bridge_instances": 0,
                      "bridge_device_time": 0.0}
        import jax.numpy as jnp
        out = self.fn(jnp.asarray(self.P), jnp.asarray(self.Wt),
                      jnp.asarray(self.Lv), jnp.asarray(self.tgt))
        out[0].block_until_ready()      # warm-up compile before timing

    def row(self, i):
        """Writable (P, Wt, Lv, tgt) slices for the native export."""
        return self.P[i], self.Wt[i], self.Lv[i], self.tgt[i]

    def solve(self, nrows):
        """(ostk [n,T,K,S], par [n,V,K], pix [n,V,K]) int32 for the first
        nrows batch slots."""
        import time

        import jax.numpy as jnp

        from .meshing import account_out, shard_args
        t0 = time.perf_counter()
        args = [jnp.asarray(self.P), jnp.asarray(self.Wt),
                jnp.asarray(self.Lv), jnp.asarray(self.tgt)]
        args, _ = shard_args(args, [], self.stats)
        ostk, par, pix = self.fn(*args)
        account_out((ostk, par, pix), self.stats)
        # ascontiguousarray, not asarray: this chip's backend exposes
        # device buffers as NON-C-contiguous numpy views (TPU tiled
        # layout, e.g. strides (256, 20480, 4096) for [T, K, S] i32), and
        # the native consumer reads raw ctypes.data as dense row-major —
        # a plain view would feed it scrambled tables (byte-divergence
        # found by the incubator-mesh dryrun, round 3).
        ostk = np.ascontiguousarray(ostk)
        par = np.ascontiguousarray(par)
        pix = np.ascontiguousarray(pix)
        self.stats["bridge_device_time"] += time.perf_counter() - t0
        self.stats["bridge_dispatches"] += 1
        self.stats["bridge_instances"] += nrows
        return ostk[:nrows], par[:nrows], pix[:nrows]

    def reset_rows(self, nrows):
        self.P[:nrows] = -1
        self.Wt[:nrows] = 0
        self.Lv[:nrows] = 0
        self.tgt[:nrows] = -1


def bridge_dp_host(P, Wt, Lv, tgt):
    """Numpy oracle with identical semantics (tests pin kernel == this ==
    the solver.py DP)."""
    P = np.asarray(P)
    Wt = np.asarray(Wt)
    Lv = np.asarray(Lv)
    tgt = np.asarray(tgt)
    B, V, E = P.shape
    T = tgt.shape[1]
    ostk = np.full((B, T, K, S), -1, dtype=np.int32)
    opar = np.full((B, V, K), -1, dtype=np.int32)
    opix = np.full((B, V, K), -1, dtype=np.int32)
    for b in range(B):
        table = [[] for _ in range(V)]   # entries: (stack list, len, e, i)
        table[0] = [([SENTINEL] * S, int(Lv[b, 0]), -1, -1)]
        for k in range(1, V):
            cands = []
            for e in range(E):
                j = int(P[b, k, e])
                if j < 0:
                    continue
                w = int(Wt[b, k, e])
                for i, ent in enumerate(table[j]):
                    st = ent[0]
                    c = sum(1 for x in st if x <= w)
                    if c >= S:
                        nst = list(st)
                    else:
                        nst = st[:c] + [w] + st[c:S - 1]
                    cands.append((nst, ent[1] + int(Lv[b, k]), j, i))
            cands.sort(key=lambda t: ([-x for x in t[0]], t[1]))
            table[k] = cands[:K]
            for i, ent in enumerate(table[k]):
                opar[b, k, i] = ent[2]
                opix[b, k, i] = ent[3]
        for t in range(T):
            v = int(tgt[b, t])
            if v < 0:
                continue
            for i, ent in enumerate(table[v]):
                ostk[b, t, i, :] = ent[0]
    return ostk, opar, opix
