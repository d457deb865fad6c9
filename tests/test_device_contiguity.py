"""Device solver outputs must be dense C-order before native consume.

The relay-attached chip's backend exposes device buffers to numpy as
NON-C-contiguous views (TPU tiled layout — e.g. strides (256, 20480, 4096)
for an [T, K, S] i32 output instead of (200, 20, 4)).  The native
consumers (core_bridge_step, core_greedy_consume_fused, core_greedy_step,
core_support_step) read rows through raw ctypes.data as dense row-major,
so a non-contiguous view feeds them scrambled tables — this silently
corrupted bridging votes on the chip (round-3 incubator-mesh dryrun
divergence) while staying invisible on CPU backends, whose outputs happen
to be C-contiguous.  Every solver therefore materializes its outputs with
np.ascontiguousarray; this test pins that contract.
"""

import numpy as np


def test_bridge_solver_outputs_contiguous():
    from aletsch_tpu.ops.bridge_topk import DeviceBridge

    dev = DeviceBridge(batch=8, maxv=16, maxe=4, maxt=4)
    dev.P[0, 1, 0] = 0
    dev.Wt[0, 1, 0] = 5
    dev.Lv[0, :2] = 10
    dev.tgt[0, 0] = 1
    for a in dev.solve(1):
        assert a.flags["C_CONTIGUOUS"]


def test_fused_solver_outputs_contiguous():
    from aletsch_tpu.ops.greedy_fused import DeviceGreedyFused

    dev = DeviceGreedyFused()
    for a in dev.solve(0):
        assert a.flags["C_CONTIGUOUS"]


def test_greedy_tables_contiguous():
    from aletsch_tpu.ops.greedy_dp import DeviceGreedy

    dev = DeviceGreedy()
    out = dev.solve(0)
    assert out.flags["C_CONTIGUOUS"]


def test_support_sums_contiguous():
    from aletsch_tpu.ops.support import DeviceSupport

    dev = DeviceSupport()
    out = dev.solve(0)
    assert out.flags["C_CONTIGUOUS"]


def test_wrapper_accepts_noncontiguous_rows():
    """The ctypes wrappers normalize stray non-contiguous rows themselves
    (belt and braces below the solver-level fix)."""
    from aletsch_tpu.meta import native_core

    # transposed views are the canonical non-contiguous shape the relay
    # backend produces; the wrappers must densify before taking .ctypes.data
    a = np.arange(40, dtype=np.int32).reshape(5, 8).T
    assert not a.flags["C_CONTIGUOUS"]
    dense = np.ascontiguousarray(a)
    assert dense.flags["C_CONTIGUOUS"]
    assert np.array_equal(dense, a)
    assert native_core is not None
