"""Pairwise splice-set similarity: set intersections as a binary matmul.

The reference computes O(n^2) sorted set intersections per region
(meta/bundle_group.cc:190-231).  TPU-native: build a per-region bundle x
splice incidence matrix (splices coordinate-compressed), compute the
intersection-count matrix C = A @ A^T on the MXU, then r = C / min(|A|, |B|).
Small subsets fall back to numpy to avoid dispatch overhead.
"""

from __future__ import annotations

import numpy as np

_JIT_CACHE = {}
_JAX_THRESHOLD = 48       # below this, host numpy wins


def _intersection_matrix_host(inc):
    return inc @ inc.T


def _get_jax_fn():
    if "fn" in _JIT_CACHE:
        return _JIT_CACHE["fn"]
    try:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def fn(inc):
            # bundle x splice incidence in bf16 is exact for 0/1 counts
            # up to 2^8 shared splices per pair; use f32 accumulation.
            return jnp.dot(inc, inc.T, preferred_element_type=jnp.float32)

        _JIT_CACHE["fn"] = fn
    except Exception:       # pragma: no cover - jax always present in CI
        _JIT_CACHE["fn"] = None
    return _JIT_CACHE["fn"]


def _pad(n, step=128):
    """Round up to shape buckets so the relay compiles a handful of
    shapes instead of one per region (first compile is ~0.5s each)."""
    return max(step, ((n + step - 1) // step) * step)


def _intersection_matrix_device(inc):
    """MXU matmul over a zero-padded bucket; exact for 0/1 incidence."""
    fn = _get_jax_fn()
    if fn is None:
        return _intersection_matrix_host(inc)
    n, p = inc.shape
    nb, pb = _pad(n), _pad(p)
    if (nb, pb) != (n, p):
        buf = np.zeros((nb, pb), dtype=np.float32)
        buf[:n, :p] = inc
        inc = buf
    return np.asarray(fn(inc))[:n, :n]


def pairwise_splice_similarity(splice_lists, min_similarity):
    """Return [(i, j, count, ratio)] for i < j with count > 0.5 and
    ratio >= min_similarity; ratio = |A ^ B| / min(|A|, |B|)."""
    n = len(splice_lists)
    if n <= 1:
        return []
    sizes = np.array([len(s) for s in splice_lists], dtype=np.int64)
    # coordinate-compress splice positions
    allp = sorted({p for s in splice_lists for p in s})
    if len(allp) == 0:
        return []
    pidx = {p: i for i, p in enumerate(allp)}
    inc = np.zeros((n, len(allp)), dtype=np.float32)
    for i, s in enumerate(splice_lists):
        for p in s:
            inc[i, pidx[p]] = 1.0
    if n >= _JAX_THRESHOLD:
        c = _intersection_matrix_device(inc)
    else:
        c = _intersection_matrix_host(inc)
    out = []
    mins = np.minimum(sizes[:, None], sizes[None, :])
    with np.errstate(divide="ignore", invalid="ignore"):
        r = np.where(mins > 0, c / mins, 0.0)
    ii, jj = np.nonzero((c > 0.50) & (r >= min_similarity))
    for i, j in zip(ii.tolist(), jj.tolist()):
        if i >= j:
            continue
        out.append((i, j, float(c[i, j]), float(r[i, j])))
    return out
