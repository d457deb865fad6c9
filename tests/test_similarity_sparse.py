"""Sparse device similarity form (round-4 verdict item 8) vs the host
pairwise path: COO upload + on-device conservative threshold + compact
top-K download must return the EXACT same [(i, j, count, ratio)] list —
same pairs, same float values, same (row-major) order, because the
stable ratio sort downstream tie-breaks on list order
(meta/bundle_group.py _build_splice_similarity)."""

import random

import numpy as np
import pytest

from aletsch_tpu.ops import similarity


def _lists(n, npos, rng, lo=2, hi=14):
    return [sorted(rng.sample(range(npos), rng.randint(lo, hi)))
            for _ in range(n)]


def _host(lists, ms):
    th = similarity._JAX_THRESHOLD
    similarity._JAX_THRESHOLD = 10 ** 9
    try:
        return similarity.pairwise_splice_similarity(lists, ms)
    finally:
        similarity._JAX_THRESHOLD = th


@pytest.mark.parametrize("n,ms", [(64, 0.2), (64, 0.8), (200, 0.5)])
def test_sparse_matches_host(n, ms):
    rng = random.Random(17)
    lists = _lists(n, 300, rng)
    host = _host(lists, ms)
    dev = similarity.pairwise_splice_similarity(lists, ms)
    assert dev == host


def test_sparse_overflow_falls_back(monkeypatch):
    """More qualifying candidates than the K cap: the sparse path must
    decline (return None) and the dense path take over, identically."""
    rng = random.Random(23)
    # near-identical lists -> almost every pair qualifies
    base = sorted(rng.sample(range(60), 10))
    lists = [sorted(set(base + [rng.randrange(60)])) for _ in range(80)]
    monkeypatch.setattr(similarity, "_K_CAP", 16)
    host = _host(lists, 0.2)
    assert len(host) > 16
    sizes = np.array([len(s) for s in lists], dtype=np.int64)
    allp = sorted({p for s in lists for p in s})
    pidx = {p: i for i, p in enumerate(allp)}
    res = similarity._pairs_device_sparse(lists, sizes, pidx, len(allp),
                                          0.2)
    assert res is None                      # overflow declined
    dev = similarity.pairwise_splice_similarity(lists, 0.2)
    assert dev == host                      # dense fallback identical


def test_sparse_empty_and_disjoint():
    lists = [[1, 2], [10, 11], [20, 21]] * 30
    sizes = np.array([2] * 90, dtype=np.int64)
    allp = sorted({p for s in lists for p in s})
    pidx = {p: i for i, p in enumerate(allp)}
    res = similarity._pairs_device_sparse(lists, sizes, pidx, len(allp),
                                          0.5)
    host = _host(lists, 0.5)
    assert res == host                      # identical repeated lists
