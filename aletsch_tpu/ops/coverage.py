"""Batched coverage statistics over padded segment arrays.

Vectorized replacement of evaluate_rectangle (rnacore/interval_map.cc:166-195)
for many regions at once: given per-region segment values/lengths (padded,
masked) and the region span, compute (ave, dev, max) exactly as the
reference — gaps count toward the average but contribute no variance term.
"""

from __future__ import annotations

import numpy as np

_JIT = {}


def region_stats_host(vals, lens, mask, span):
    """vals/lens/mask: [R, S]; span: [R]. Returns (ave, dev, mx): [R]."""
    vals = np.asarray(vals, dtype=np.float64)
    lens = np.asarray(lens, dtype=np.float64)
    mask = np.asarray(mask, dtype=np.float64)
    span = np.asarray(span, dtype=np.float64)
    vm = vals * mask
    lm = lens * mask
    mx = (vm).max(axis=1)
    tot = (vm * lm).sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        ave = np.where(span > 0, tot / span, 0.0)
    var = (lm * (vals - ave[:, None]) ** 2 * mask).sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        dev = np.sqrt(np.where(span > 0, var / span, 0.0))
    empty = mask.sum(axis=1) == 0
    ave = np.where(empty, 0.0, ave)
    dev = np.where(empty, 1.0, dev)
    mx = np.where(empty, 0.0, mx)
    return ave, dev, mx


def region_stats_traced(jnp, vals, lens, mask, span, empty_defaults=True):
    """The traced evaluate_rectangle formula, shared by the standalone
    jit (get_region_stats_fn) and the wave step it is fused into
    (parallel/mesh.py _step_impl -- the production mesh/dryrun path)."""
    vm = vals * mask
    lm = lens * mask
    mx = jnp.max(vm, axis=1)
    tot = jnp.sum(vm * lm, axis=1)
    ave = jnp.where(span > 0, tot / jnp.maximum(span, 1.0), 0.0)
    var = jnp.sum(lm * (vals - ave[:, None]) ** 2 * mask, axis=1)
    dev = jnp.sqrt(jnp.where(span > 0, var / jnp.maximum(span, 1.0), 0.0))
    if empty_defaults:
        empty = jnp.sum(mask, axis=1) == 0
        ave = jnp.where(empty, 0.0, ave)
        dev = jnp.where(empty, 1.0, dev)
        mx = jnp.where(empty, 0.0, mx)
    return ave, dev, mx


def get_region_stats_fn():
    if "fn" in _JIT:
        return _JIT["fn"]
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fn(vals, lens, mask, span):
        return region_stats_traced(jnp, vals, lens, mask, span)

    _JIT["fn"] = fn
    return fn
