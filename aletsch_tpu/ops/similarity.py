"""Pairwise splice-set similarity: set intersections as a binary matmul.

The reference computes O(n^2) sorted set intersections per region
(meta/bundle_group.cc:190-231).  TPU-native: build a per-region bundle x
splice incidence matrix (splices coordinate-compressed), compute the
intersection-count matrix C = A @ A^T on the MXU, then r = C / min(|A|, |B|).
Small subsets fall back to numpy to avoid dispatch overhead.

Sparse device form (round-4 verdict item 8): the dense path moves
n x P f32 up and n x n f32 down — both transfer-dominated on a relay
attachment.  The sparse form uploads the incidence as COO pairs
(O(nnz), ~100x smaller), densifies with one on-device scatter, runs the
same MXU matmul, thresholds ON DEVICE (conservatively, in exact-int
slack), and downloads only a top-K compaction of qualifying pair
indices + counts (O(K)); the exact f64 ratio test reruns on host over
the compacted candidates, so results are bit-identical to the host
path.  Falls back to the dense download when the candidate count
overflows the K cap.
"""

from __future__ import annotations

import numpy as np

_JIT_CACHE = {}
_JAX_THRESHOLD = 48       # below this, host numpy wins
_K_CAP = 131072           # compacted candidate-pair download cap (~1 MB)


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


def _get_sparse_fn(NB, PB, NNZ):
    K = min(_K_CAP, NB * NB)     # baked in at trace time: key on it
    key = ("sparse", NB, PB, NNZ, K)
    if key in _JIT_CACHE:
        return _JIT_CACHE[key], K
    try:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def fn(rows, cols, vals, sizes, thresh):
            inc = jnp.zeros((NB, PB), jnp.float32).at[rows, cols].add(vals)
            c = jnp.dot(inc, inc.T, preferred_element_type=jnp.float32)
            szf = sizes.astype(jnp.float32)
            mins = jnp.minimum(szf[:, None], szf[None, :])
            ii = jnp.arange(NB, dtype=jnp.int32)
            upper = ii[:, None] < ii[None, :]
            # conservative integer-slack threshold: c and mins are exact
            # small ints in f32, so any pair the exact f64 host test
            # accepts satisfies c >= thresh*mins - 0.5 here (f32 product
            # error << 0.5); the exact test reruns on host over the
            # compacted candidates
            qual = upper & (c > 0.5) & (c >= thresh * mins - 0.5)
            flat = qual.reshape(-1)
            nq = jnp.sum(flat.astype(jnp.int32))
            # encode so top_k returns candidates in ascending flat
            # (row-major) order — the host path's np.nonzero order,
            # which the stable ratio sort tie-breaks on
            enc = jnp.where(
                flat,
                NB * NB - jax.lax.broadcasted_iota(
                    jnp.int32, (NB * NB, 1), 0)[:, 0],
                0)
            topv = jax.lax.top_k(enc, K)[0]
            idx = jnp.where(topv > 0, NB * NB - topv, 0)
            cv = jnp.take(c.reshape(-1), idx)
            return idx, cv, (topv > 0), nq

        _JIT_CACHE[key] = fn
    except Exception:       # pragma: no cover
        _JIT_CACHE[key] = None
    return _JIT_CACHE[key], K


def _pad_nnz(nnz):
    b = 1024
    while b < nnz:
        b *= 2
    return b


def _pairs_device_sparse(splice_lists, sizes, pidx, n_splices,
                         min_similarity):
    """COO upload + on-device threshold + compact download; returns the
    [(i, j, count, ratio)] list bit-identical to the host path, or None
    to fall back (overflow / no jax)."""
    import jax.numpy as jnp
    n = len(splice_lists)
    rows_l, cols_l = [], []
    for i, s in enumerate(splice_lists):
        for p in s:
            rows_l.append(i)
            cols_l.append(pidx[p])
    nnz = len(rows_l)
    NB, PB, NZ = _pad(n), _pad(n_splices), _pad_nnz(nnz)
    fn, K = _get_sparse_fn(NB, PB, NZ)
    if fn is None:
        return None
    rows = np.zeros(NZ, dtype=np.int32)
    cols = np.zeros(NZ, dtype=np.int32)
    vals = np.zeros(NZ, dtype=np.float32)
    rows[:nnz] = rows_l
    cols[:nnz] = cols_l
    vals[:nnz] = 1.0
    szs = np.zeros(NB, dtype=np.int32)
    szs[:n] = sizes
    idx, cv, live, nq = fn(jnp.asarray(rows), jnp.asarray(cols),
                           jnp.asarray(vals), jnp.asarray(szs),
                           jnp.float32(min_similarity))
    if int(nq) > K:
        return None             # candidate overflow: dense fallback
    idx = np.asarray(idx)
    cv = np.asarray(cv)
    live = np.asarray(live)
    out = []
    for k in range(len(idx)):
        if not live[k]:
            break               # descending-encoded: dead tail
        i, j = divmod(int(idx[k]), NB)
        if i >= n or j >= n:
            continue
        c = float(cv[k])
        # exact f64 ratio test, identical to the host expression
        mn = min(sizes[i], sizes[j])
        r = c / mn if mn > 0 else 0.0
        if c > 0.50 and r >= min_similarity:
            out.append((i, j, c, r))
    return out


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
    if n >= _JAX_THRESHOLD:
        res = _pairs_device_sparse(splice_lists, sizes, pidx, len(allp),
                                   min_similarity)
        if res is not None:
            return res
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
