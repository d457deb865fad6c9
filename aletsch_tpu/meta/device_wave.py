"""Wave-level orchestration of the device greedy max-path DP.

One region wave's groups (meta/incubator.py process_region) are assembled
concurrently as paused native GroupRuns: every group's currently-active
splice graph is exported into one padded adjacency batch, the bottleneck
tables for all of them are computed in a single TPU dispatch
(ops/greedy_dp.py), and each group consumes its table and advances to the
next extraction or the next graph.  Graphs within a group stay strictly
sequential (later graphs' cross-sample supports read earlier graphs'
post-greedy state, assembler.cc:177-373), so the batch axis is the group
axis — exactly the parallel structure SURVEY §2.8 identifies.

Device-ineligible graphs (too small / too large / f32-lossy weights) are
solved by the native host DP mid-stream; results are byte-identical either
way (the differential fuzz runs this path forced on).
"""

from __future__ import annotations

import os

from . import native_core

# wave statistics (bench reports device share from these)
stats = {
    "host_graphs": 0,        # paused graphs solved by the native host DP
    "device_steps": 0,       # device-guided path extractions
    "waves": 0,
}

_DEVICE = None
_DEVICE_FAILED = False


def _get_device():
    global _DEVICE, _DEVICE_FAILED
    if _DEVICE is None and not _DEVICE_FAILED:
        try:
            from ..ops.greedy_dp import DeviceGreedy
            _DEVICE = DeviceGreedy()
        except Exception:       # no jax / no backend: stay on host
            _DEVICE_FAILED = True
    return _DEVICE


def device_stats():
    d = dict(stats)
    if _DEVICE is not None:
        d.update(_DEVICE.stats)
    return d


def enabled(cfg, n_groups):
    """Decide whether to run this wave through the device path."""
    mode = getattr(cfg, "device_greedy", "off")
    env = os.environ.get("ALETSCH_DEVICE")
    if env == "0":
        return False
    if env == "1" or mode == "on":
        return native_core.native_core_available()
    if mode != "auto":
        return False
    if n_groups < getattr(cfg, "device_min_groups", 16):
        return False
    return native_core.native_core_available()


def assemble_groups(asms, gvs, cfg):
    """Device-batched equivalent of the serial `asmb.resolve(gv)` loop.
    Returns True when handled; False when the caller should fall back."""
    dev = _get_device()
    if dev is None:
        return False
    minv = int(getattr(cfg, "device_min_vertices", 16))
    runs = []               # (asmb, gv, handle-or-None) in group order
    active = []
    for asmb, gv in zip(asms, gvs):
        gh = native_core.start_group_device(asmb, gv, True, minv)
        runs.append((asmb, gv, gh))
        if gh is not None and gh.paused:
            active.append(gh)
    stats["waves"] += 1

    while active:
        nxt = []
        exported = []

        def flush():
            if not exported:
                return
            tables = dev.solve(len(exported))
            for i, g in enumerate(exported):
                stats["device_steps"] += 1
                if native_core.greedy_step(g, tables[i]):
                    nxt.append(g)
            del exported[:]

        for gh in active:
            v = native_core.greedy_export(gh, dev.row(len(exported)),
                                          dev.maxv)
            if v <= 0:
                stats["host_graphs"] += 1
                if native_core.greedy_solve_host(gh):
                    nxt.append(gh)
                continue
            exported.append(gh)
            if len(exported) == dev.batch:
                flush()
        flush()
        active = nxt

    # replay in group order (determinism), host-fallback where ineligible
    for asmb, gv, gh in runs:
        if gh is None:
            asmb.resolve(gv)
        else:
            native_core.finish_group_device(gh)
    return True
