"""Pinned-shape batch solver for the device scallop ladder.

Production wrapper around ops/ladder_kernel.py (meta/device_wave.py
dispatches it at pause kind 4): the native export fills rows with each
paused graph's pre-ladder dense state, one solve() runs the whole
resolution-arm prefix for every exported graph in a single dispatch, and
the native consume replays the decision logs with full metadata
(native/core_scallop.h ladder_replay).  Trust/verify mode follows the
fused-drain probe (ops/greedy_fused.py device_f64_exact)."""

from __future__ import annotations

import numpy as np

from . import ladder_kernel as lk


class DeviceLadder:
    def __init__(self, batch=lk.DEFAULT_B, maxv=lk.DEFAULT_V,
                 maxe=lk.DEFAULT_E, maxh=lk.DEFAULT_H, maxl=lk.DEFAULT_L,
                 dmax=lk.DEFAULT_DMAX, dlog=lk.DEFAULT_DLOG):
        self.batch = batch
        self.maxv = maxv
        self.maxe = maxe
        self.maxh = maxh
        self.maxl = maxl
        self.dmax = dmax
        self.dlog = dlog
        B, V, E, H, L = batch, maxv, maxe, maxh, maxl
        self.esrc = np.full((B, E), -1, np.int32)
        self.edst = np.full((B, E), -1, np.int32)
        self.ewrt = np.zeros((B, E), np.float64)
        self.estr = np.zeros((B, E), np.int32)
        self.esin = np.zeros((B, E), np.int32)
        self.esout = np.zeros((B, E), np.int32)
        self.ealive = np.zeros((B, E), np.uint8)
        self.meta3 = np.zeros((B, 3), np.int32)      # nedges, nstamp, nv
        self.nz = np.zeros((B, V), np.uint8)
        self.hedge = np.full((B, H, L), -1, np.int32)
        self.hlen = np.zeros((B, H), np.int32)
        self.scal = np.zeros((B, 4), np.float64)     # jump, smallr, guard,
                                                     # smin
        self.fn = lk.get_ladder_fn(B, V, E, H, L, dmax, dlog)
        self.stats = {"ladder_dispatches": 0, "ladder_graphs": 0,
                      "ladder_device_time": 0.0, "ladder_decisions": 0}
        self._solve(0)                               # warm-up compile

    def row(self, i):
        """Writable slices for the native export, in the C ABI's order."""
        return (self.esrc[i], self.edst[i], self.ewrt[i], self.estr[i],
                self.esin[i], self.esout[i], self.ealive[i], self.meta3[i],
                self.nz[i], self.hedge[i], self.hlen[i], self.scal[i])

    def _solve(self, nrows):
        import jax

        from .meshing import account_out, shard_args
        self.meta3[nrows:, 2] = 0                    # stale rows inactive
        with jax.enable_x64():
            import jax.numpy as jnp
            args = [jnp.asarray(self.esrc), jnp.asarray(self.edst),
                    jnp.asarray(self.ewrt), jnp.asarray(self.estr),
                    jnp.asarray(self.esin), jnp.asarray(self.esout),
                    jnp.asarray(self.ealive.astype(bool)),
                    jnp.asarray(np.ascontiguousarray(self.meta3[:, 0])),
                    jnp.asarray(np.ascontiguousarray(self.meta3[:, 1])),
                    jnp.asarray(self.nz.astype(bool)),
                    jnp.asarray(self.hedge), jnp.asarray(self.hlen),
                    jnp.asarray(np.ascontiguousarray(self.meta3[:, 2])),
                    jnp.asarray(np.ascontiguousarray(self.scal[:, 0])),
                    jnp.asarray(np.ascontiguousarray(self.scal[:, 1])),
                    jnp.asarray(np.ascontiguousarray(self.scal[:, 2])),
                    jnp.asarray(np.ascontiguousarray(self.scal[:, 3]))]
            args, _ = shard_args(args, [], self.stats)
            out = self.fn(*args)
            out[2].block_until_ready()
        larm, ltgt, ndec, status = out[:4]
        account_out((larm, ltgt, ndec, status), self.stats)
        # relay buffers can be non-C-contiguous views (CLAUDE.md gotcha)
        return (np.ascontiguousarray(larm), np.ascontiguousarray(ltgt),
                np.ascontiguousarray(ndec), np.ascontiguousarray(status))

    def solve(self, nrows):
        """(larm [n,DLOG] i32, ltgt, ndec [n] i32, status [n] i32)."""
        import time
        t0 = time.perf_counter()
        larm, ltgt, ndec, status = self._solve(nrows)
        self.stats["ladder_device_time"] += time.perf_counter() - t0
        self.stats["ladder_dispatches"] += 1
        self.stats["ladder_graphs"] += nrows
        self.stats["ladder_decisions"] += int(ndec[:nrows].sum())
        return (larm[:nrows], ltgt[:nrows], ndec[:nrows], status[:nrows])
