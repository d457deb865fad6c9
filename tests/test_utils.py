import numpy as np
import pytest

from aletsch_tpu.constants import (CONFLICTING, CONTAINED, CONTAINING,
                                   EXTEND_LEFT, EXTEND_RIGHT, FALL_LEFT,
                                   FALL_RIGHT, IDENTICAL, NESTED, NESTING)
from aletsch_tpu.utils.intervals import CoverageMap
from aletsch_tpu.utils.seqs import (compare_sorted, consecutive_subset,
                                    merge_intron_chains, merge_sorted,
                                    overlap_sorted)


class TestCompareSorted:
    def test_identical(self):
        assert compare_sorted([1, 2, 3], [1, 2, 3]) == IDENTICAL

    def test_fall(self):
        assert compare_sorted([1, 2], [5, 6]) == FALL_RIGHT
        assert compare_sorted([5, 6], [1, 2]) == FALL_LEFT

    def test_contained_containing(self):
        # CONTAINED: qry is inside ref; CONTAINING: ref is inside qry
        assert compare_sorted([1, 2, 3, 4], [2, 3, 4]) == CONTAINED
        assert compare_sorted([2, 3, 4], [1, 2, 3, 4]) == CONTAINING
        assert compare_sorted([1, 2, 3, 4], [1, 2, 3]) == CONTAINED
        assert compare_sorted([1, 2, 3], [1, 2, 3, 4]) == CONTAINING

    def test_extend(self):
        # EXTEND_LEFT: qry extends ref leftward; EXTEND_RIGHT: rightward
        assert compare_sorted([2, 3, 4, 9], [1, 2, 3, 4]) == EXTEND_LEFT
        assert compare_sorted([1, 2, 3, 4], [2, 3, 4, 9]) == EXTEND_RIGHT

    def test_nested(self):
        assert compare_sorted([1, 10], [4, 5]) == NESTED
        assert compare_sorted([4, 5], [1, 10]) == NESTING

    def test_conflicting(self):
        assert compare_sorted([1, 3, 5], [1, 4, 5]) == CONFLICTING
        assert compare_sorted([1, 3, 5, 7], [3, 4]) == CONFLICTING


class TestMergeOverlap:
    def test_merge_extend(self):
        ok, m = merge_sorted([3, 4, 5], [1, 2, 3])
        assert ok and m == [1, 2, 3, 4, 5]
        ok, m = merge_sorted([1, 2, 3], [3, 4, 5])
        assert ok and m == [1, 2, 3, 4, 5]

    def test_merge_fall(self):
        ok, m = merge_sorted([1, 2], [7, 8])
        assert ok and m == [1, 2, 7, 8]

    def test_merge_conflict(self):
        ok, _ = merge_sorted([1, 3], [2, 4])
        assert not ok

    def test_overlap(self):
        ok, o = overlap_sorted([2, 3, 4], [3, 4, 5, 6])
        assert ok and o == [3, 4]

    def test_merge_intron_chains_parity(self):
        # overlap difference must be even to preserve intron pairing
        ok, m = merge_intron_chains([10, 20], [20, 30])
        assert not ok  # overlap of 1 breaks pairing
        ok, m = merge_intron_chains([10, 20, 30, 40], [30, 40, 50, 60])
        assert ok and m == [10, 20, 30, 40, 50, 60]
        ok, m = merge_intron_chains([30, 40], [10, 20])
        assert not ok  # x must start no later than y


def test_consecutive_subset():
    assert consecutive_subset([1, 2, 3, 2, 3], [2, 3]) == [1, 3]
    assert consecutive_subset([1, 2], [3]) == []


class TestCoverageMap:
    def test_basic_split_semantics(self):
        m = CoverageMap()
        m.add(0, 10, 1)
        m.add(5, 15, 1)
        l, r, v = m.segments
        assert l.tolist() == [0, 5, 10]
        assert r.tolist() == [5, 10, 15]
        assert v.tolist() == [1, 2, 1]

    def test_zero_cancellation(self):
        m = CoverageMap()
        m.add(0, 10, 1)
        m.add(0, 10, -1)
        l, _, _ = m.segments
        assert l.size == 0
        assert m.find_value(5) == 0

    def test_borders_preserved(self):
        m = CoverageMap()
        m.add(0, 5, 1)
        m.add(5, 10, 1)
        l, r, v = m.segments
        # split maps never join adjacent equal-valued segments
        assert l.tolist() == [0, 5]

    def test_evaluate_rectangle(self):
        m = CoverageMap()
        m.add(0, 10, 2)     # segment [0,10) cov 2
        m.add(20, 30, 4)    # gap [10,20), then cov 4
        ave, dev, mx = m.evaluate_rectangle(0, 30)
        assert mx == 4.0
        assert ave == pytest.approx((10 * 2 + 10 * 4) / 30)
        var = 10 * (2 - ave) ** 2 + 10 * (4 - ave) ** 2
        assert dev == pytest.approx(np.sqrt(var / 30))

    def test_contained_edge_overlap_excluded(self):
        m = CoverageMap()
        m.add(0, 10, 1)
        # query window cuts the only segment -> nothing contained
        l, r, v = m.contained(2, 8)
        assert l.size == 0
        ave, dev, mx = m.evaluate_rectangle(2, 8)
        assert (ave, dev, mx) == (0.0, 1.0, 0.0)

    def test_covered_runs(self):
        m = CoverageMap()
        m.add(0, 5, 1)
        m.add(5, 10, 3)
        m.add(20, 25, 1)
        assert m.covered_runs(0, 25) == [(0, 10), (20, 25)]

    def test_negative_removal_resplits(self):
        m = CoverageMap()
        m.add(0, 20, 1)
        m.add(5, 10, -1)
        l, r, v = m.segments
        assert l.tolist() == [0, 10]
        assert r.tolist() == [5, 20]
        assert v.tolist() == [1, 1]
