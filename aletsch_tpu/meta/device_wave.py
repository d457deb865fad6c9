"""Wave-level orchestration of the device DPs (greedy max-path + bridging).

One region wave's groups (meta/incubator.py process_region) are assembled
concurrently as paused native GroupRuns; the runs pause at two kinds of
device-offloadable DP:

- kind 1, greedy decomposition: every group's currently-active splice
  graph is exported ONCE into one padded [B, V, V] batch and a single
  fused dispatch runs each graph's whole repeat-until-drained loop
  (ops/greedy_fused.py: f64 while_loop of DP -> backtrace -> bottleneck
  subtraction), returning packed path tables the native side replays
  (matches rnacore/splice_graph.cc:819-885 via scallop/scallop.cc:
  2874-2897).  ALETSCH_DEVICE_GREEDY=step restores the round-2
  per-extraction table path (ops/greedy_dp.py) for A/B measurement.
- kind 2, bridging pier DP: each group pauses once per bridging PHASE
  with every queued (source-run, strand) DP instance of every bundle
  exported together (core.cpp GroupRun::queue_bridge); the wave batches
  instances across groups into [64, ...] dispatches (ops/bridge_topk.py)
  and feeds results back in queue order for the native backtrace + vote
  (matches bridge/bridge_solver.cc:484-568, 276-385).

Graphs within a group stay strictly sequential (later graphs' cross-sample
supports read earlier graphs' post-greedy state, assembler.cc:177-373), so
the batch axis is the group axis — exactly the parallel structure SURVEY
§2.8 identifies.

Device-ineligible instances (too small / too large / f32-lossy weights /
over-padded windows) are solved by the native host DP mid-stream; results
are byte-identical either way (the differential fuzz runs this path forced
on).
"""

from __future__ import annotations

import os

from . import native_core

# wave statistics (bench reports device share from these)
stats = {
    "host_graphs": 0,        # paused graphs solved by the native host DP
    "device_steps": 0,       # device-guided path extractions
    "host_bridge_insts": 0,  # pier-DP instances solved by the host DP
    "device_bridge_insts": 0,  # pier-DP instances consumed from the device
    "host_support_groups": 0,   # support reduces solved by the host sums
    "device_support_groups": 0,  # support reduces consumed from the device
    "host_ladder_graphs": 0,    # ladder-paused graphs solved on host
    "device_ladder_graphs": 0,  # ladder decision logs consumed from device
    "waves": 0,
}

_DEVICE = None
_DEVICE_FAILED = False
_FUSED = None
_FUSED_FAILED = False
_FUSED_TRUST = None
_BRIDGE = None
_BRIDGE_FAILED = False
_SUPPORT = None
_SUPPORT_FAILED = False


def _get_device():
    global _DEVICE, _DEVICE_FAILED
    if _DEVICE is None and not _DEVICE_FAILED:
        try:
            from ..ops.greedy_dp import DeviceGreedy
            _DEVICE = DeviceGreedy()
        except Exception:       # no jax / no backend: stay on host
            _DEVICE_FAILED = True
    return _DEVICE


def _get_fused_device():
    """Fused-drain solver (ops/greedy_fused.py): the default greedy device
    path -- one dispatch drains every exported graph of the round instead
    of one dispatch per extraction.  ALETSCH_DEVICE_GREEDY=step restores
    the per-extraction path for A/B measurements."""
    global _FUSED, _FUSED_FAILED, _FUSED_TRUST
    if os.environ.get("ALETSCH_DEVICE_GREEDY") == "step":
        return None
    if not native_core.fused_available():
        return None
    if _FUSED is None and not _FUSED_FAILED:
        try:
            from ..ops.greedy_fused import DeviceGreedyFused, device_f64_exact
            _FUSED_TRUST = device_f64_exact()
            _FUSED = DeviceGreedyFused()
        except Exception:
            _FUSED_FAILED = True
    return _FUSED


def _get_bridge_device():
    global _BRIDGE, _BRIDGE_FAILED
    if _BRIDGE is None and not _BRIDGE_FAILED:
        try:
            from ..ops.bridge_topk import DeviceBridge
            _BRIDGE = DeviceBridge()
        except Exception:
            _BRIDGE_FAILED = True
    return _BRIDGE


def _get_support_device():
    global _SUPPORT, _SUPPORT_FAILED
    if _SUPPORT is None and not _SUPPORT_FAILED:
        try:
            from ..ops.support import DeviceSupport
            _SUPPORT = DeviceSupport()
        except Exception:
            _SUPPORT_FAILED = True
    return _SUPPORT


_LADDER = None
_LADDER_FAILED = False
_LADDER_TRUST = None


def _get_ladder_device():
    global _LADDER, _LADDER_FAILED, _LADDER_TRUST
    if _LADDER is None and not _LADDER_FAILED:
        try:
            from ..ops.greedy_fused import device_f64_exact
            from ..ops.ladder_device import DeviceLadder
            _LADDER_TRUST = device_f64_exact()
            _LADDER = DeviceLadder()
        except Exception:
            _LADDER_FAILED = True
    return _LADDER


_MESH_KEYS = ("mesh_dispatches", "mesh_bytes_in", "mesh_bytes_out")


def device_stats():
    d = dict(stats)
    solvers = [s for s in (_DEVICE, _FUSED, _BRIDGE, _SUPPORT, _LADDER)
               if s is not None]
    for s in solvers:
        d.update({k: v for k, v in s.stats.items() if k not in _MESH_KEYS})
    # mesh accounting sums across the per-stage solvers
    for k in _MESH_KEYS:
        tot = sum(s.stats.get(k, 0) for s in solvers)
        if tot:
            d[k] = tot
    for s in solvers:
        if "mesh_devices" in s.stats:
            d["mesh_devices"] = s.stats["mesh_devices"]
    if _FUSED is not None:
        d["fused_trust"] = bool(_FUSED_TRUST)
        d["fused_agree"] = int(native_core.fused_stats[0])
        d["fused_total"] = int(native_core.fused_stats[1])
    if _LADDER is not None:
        d["ladder_trust"] = bool(_LADDER_TRUST)
        d["ladder_agree"] = int(native_core.ladder_stats[0])
        d["ladder_total"] = int(native_core.ladder_stats[1])
    return d


_AUTO_CAL = ("unset",)


def auto_calibration(cfg):
    """Measured amortization model shared by every 'auto' device stage:
    engage the chip iff dispatch_cost(B) = a + b*B beats the native host
    cost c*B for the wave at hand (ops/crossover.py; replaces the round-3
    fixed device_auto_max_dispatch_ms threshold).  Returns the calibration
    dict, or None when the device path should stay off:

    - '' / cpu backend: the "device" IS this host -- a dispatch only adds
      orchestration overhead over the native drain (measured ~1-3 ms vs
      ~0.1 ms native for a 64-graph wave) -> None without measuring (also
      keeps worker subprocesses from ever initializing a backend,
      CLAUDE.md gotchas);
    - axon (tunnel-relayed chip) / direct tpu: load the cached crossover
      calibration for the platform (/tmp sidecar, populated by bench.py
      every round and by the first 'auto' run); measure once if absent.
      Measured on this relay: a~=0.14 s, b >> c (12 us/graph native), so
      no batch size ever amortizes -> stays host.  A direct-attached part
      (a ~ 100 us) flips the same model on at small wave sizes.

    'on' bypasses this entirely (parity runs, fuzz, probes)."""
    global _AUTO_CAL
    if _AUTO_CAL != ("unset",):
        return _AUTO_CAL
    platform = ""
    # read the platform WITHOUT importing jax: under a minimal `python -S`
    # launch (no sitecustomize) the production host path never needs the
    # 1.5 s jax import; when jax IS loaded (normal sessions), read its
    # resolved config
    import sys as _sys
    if "jax" in _sys.modules:
        try:
            platform = _sys.modules["jax"].config.jax_platforms or ""
        except Exception:
            pass
    if not platform:
        platform = os.environ.get("JAX_PLATFORMS", "")
    platform = platform.split(",")[0].strip()
    if platform not in ("tpu", "axon"):
        _AUTO_CAL = None
        return None
    try:
        from ..ops import crossover
        _AUTO_CAL = crossover.calibration(measure_if_missing=True,
                                          batches=(64,), reps=2)
    except Exception:
        _AUTO_CAL = None
    return _AUTO_CAL


def auto_device_ok(cfg, n_graphs=64):
    """True iff the measured model predicts a device win for a wave of
    n_graphs drains (see auto_calibration)."""
    from ..ops.crossover import device_wins
    return device_wins(n_graphs, auto_calibration(cfg))


def enabled(cfg, n_groups):
    """Decide whether to run this wave through the device path."""
    mode = getattr(cfg, "device_greedy", "off")
    env = os.environ.get("ALETSCH_DEVICE")
    if env == "0":
        return False
    if env == "1" or mode == "on" or bridge_enabled(cfg) \
            or support_enabled(cfg) or ladder_enabled(cfg):
        return native_core.native_core_available()
    if mode != "auto":
        return False
    if n_groups < getattr(cfg, "device_min_groups", 16):
        return False
    if not auto_device_ok(cfg, n_graphs=n_groups):
        return False
    return native_core.native_core_available()


def bridge_enabled(cfg):
    """Decide whether GroupRuns also pause at bridging pier-DP instances.

    'auto' consults the measured amortization model (auto_device_ok /
    ops/crossover.py): off wherever a + b*B >= c*B (cpu, and this relay
    where a ~= 0.14 s), engaged on a direct-attached part whose measured
    crossover predicts a win.  'on' forces the device path (fuzz/parity
    runs, probes)."""
    mode = getattr(cfg, "device_bridge", "off")
    env = os.environ.get("ALETSCH_DEVICE_BRIDGE")
    if env == "0":
        return False
    if env == "1" or mode == "on":
        return native_core.bridge_pause_available()
    if mode == "auto" and auto_device_ok(cfg):
        return native_core.bridge_pause_available()
    return False


def ladder_enabled(cfg):
    """Decide whether GroupRuns pause at the scallop resolution ladder
    (pause kind 4; ops/ladder_kernel.py batched over the wave's graphs).
    Same posture as bridge_enabled: 'auto' consults the measured
    amortization model; 'on' forces it (fuzz/parity runs, probes)."""
    mode = getattr(cfg, "device_ladder", "auto")
    env = os.environ.get("ALETSCH_DEVICE_LADDER")
    if env == "0":
        return False
    if env == "1" or mode == "on":
        return native_core.ladder_pause_available()
    if mode == "auto" and auto_device_ok(cfg):
        return native_core.ladder_pause_available()
    return False


def support_enabled(cfg):
    """Decide whether GroupRuns also pause at the cross-sample junction
    support reduce (ops/support.py).  Same posture as bridge_enabled:
    'auto' consults the measured policy (auto_device_ok; the [64,16,64]
    f32 batch is ~256 KB up / 16 KB down per dispatch while the host sums
    are a few microseconds per group, so only a direct-attached part with
    a sub-ms dispatch engages); 'on' forces it for parity runs, where the
    reduce rides the mesh sample axis (parallel/mesh.py)."""
    mode = getattr(cfg, "device_support", "off")
    env = os.environ.get("ALETSCH_DEVICE_SUPPORT")
    if env == "0":
        return False
    if env == "1" or mode == "on":
        return native_core.support_pause_available()
    if mode == "auto" and auto_device_ok(cfg):
        return native_core.support_pause_available()
    return False


def assemble_groups(asms, gvs, cfg):
    """Device-batched equivalent of the serial `asmb.resolve(gv)` loop.
    Returns True when handled; False when the caller should fall back."""
    fdev = _get_fused_device()
    dev = _get_device() if fdev is None else None
    if fdev is None and dev is None:
        return False
    bridge_dev = bridge_enabled(cfg)
    bdev = _get_bridge_device() if bridge_dev else None
    if bridge_dev and bdev is None:
        bridge_dev = False
    support_dev = support_enabled(cfg)
    sdev = _get_support_device() if support_dev else None
    if support_dev and sdev is None:
        support_dev = False
    ladder_dev = ladder_enabled(cfg)
    ldev = _get_ladder_device() if ladder_dev else None
    if ladder_dev and ldev is None:
        ladder_dev = False
    minv = int(getattr(cfg, "device_min_vertices", 16))
    from ..ops.bridge_topk import K, S
    runs = []               # (asmb, gv, handle-or-None) in group order
    active = []
    for asmb, gv in zip(asms, gvs):
        gh = native_core.start_group_device(asmb, gv, True, minv,
                                            bridge_dev, support_dev,
                                            ladder_dev)
        runs.append((asmb, gv, gh))
        if gh is not None and gh.paused:
            active.append(gh)
    stats["waves"] += 1

    while active:
        nxt = []
        g_exp = []          # greedy-paused handles with exported rows
        f_exp = []          # fused-drain handles with exported rows
        s_exp = []          # support-paused handles with exported rows
        l_exp = []          # ladder-paused handles with exported rows

        def flush_ladder():
            if not l_exp:
                return
            larm, ltgt, ndec, lstatus = ldev.solve(len(l_exp))
            for i, g in enumerate(l_exp):
                stats["device_ladder_graphs"] += 1
                if native_core.ladder_consume(
                        g, larm[i], ltgt[i], int(ndec[i]),
                        int(lstatus[i]), _LADDER_TRUST):
                    nxt.append(g)
            del l_exp[:]

        def flush_greedy():
            if not g_exp:
                return
            tables = dev.solve(len(g_exp))
            for i, g in enumerate(g_exp):
                stats["device_steps"] += 1
                if native_core.greedy_step(g, tables[i]):
                    nxt.append(g)
            del g_exp[:]

        def flush_fused():
            if not f_exp:
                return
            paths, ws, npaths = fdev.solve(len(f_exp))
            # Pallas f32 form: per-batch trust (integer-exact weights);
            # XLA f64 form: backend-level f64-exactness probe
            trust = _FUSED_TRUST if fdev.last_trust is None \
                else bool(fdev.last_trust)
            for i, g in enumerate(f_exp):
                if trust:
                    stats["device_steps"] += int(npaths[i])
                if native_core.greedy_consume_fused(
                        g, ws[i], paths[i], int(npaths[i]), fdev.maxv,
                        trust):
                    nxt.append(g)
            del f_exp[:]

        b_results = []      # per exported instance: (ostk, par, pix)
        b_cur = []          # result slots filled in the current dispatch
        b_feed = []         # (handle, plan); plan entry = slot id or -1

        def flush_bridge_rows():
            if not b_cur:
                return
            ostk, par, pix = bdev.solve(len(b_cur))
            for i, sl in enumerate(b_cur):
                b_results[sl] = (ostk[i], par[i], pix[i])
            del b_cur[:]

        def feed_bridges():
            # feed every queued instance back in flattened queue order
            # (the native consume order; see core.cpp bridge_export_at)
            flush_bridge_rows()
            for g, plan in b_feed:
                kind = g.pause_kind
                for sl in plan:
                    if sl >= 0:
                        ostk, par, pix = b_results[sl]
                        stats["device_bridge_insts"] += 1
                        kind = native_core.bridge_step(g, ostk, par, pix,
                                                       K, S)
                    else:
                        stats["host_bridge_insts"] += 1
                        kind = native_core.bridge_solve_host(g)
                if kind:
                    nxt.append(g)
            del b_feed[:]
            del b_results[:]

        def flush_support():
            if not s_exp:
                return
            sums = sdev.solve(len(s_exp))
            for i, g in enumerate(s_exp):
                stats["device_support_groups"] += 1
                if native_core.support_step(g, sums[i]):
                    nxt.append(g)
            del s_exp[:]

        for gh in active:
            if gh.pause_kind == 4:
                v = native_core.ladder_export(
                    gh, ldev.row(len(l_exp)), ldev.maxv, ldev.maxe,
                    ldev.maxh, ldev.maxl, ldev.dmax) if ladder_dev else 0
                if v <= 0:
                    stats["host_ladder_graphs"] += 1
                    if native_core.ladder_solve_host(gh):
                        nxt.append(gh)
                    continue
                l_exp.append(gh)
                if len(l_exp) == ldev.batch:
                    flush_ladder()
                continue
            if gh.pause_kind == 3:
                v = native_core.support_export(
                    gh, sdev.row(len(s_exp))) if support_dev else 0
                if v <= 0:
                    stats["host_support_groups"] += 1
                    if native_core.support_solve_host(gh):
                        nxt.append(gh)
                    continue
                s_exp.append(gh)
                if len(s_exp) == sdev.batch:
                    flush_support()
                continue
            if gh.pause_kind == 2:
                # one pause covers the whole bridging phase: export every
                # queued pier-DP instance now, feed them all after the
                # batched dispatch(es)
                n = native_core.bridge_pending(gh)
                plan = []
                for j in range(n):
                    v = 0
                    if bridge_dev:
                        v = native_core.bridge_export_at(
                            gh, j, bdev.row(len(b_cur)), K, S)
                    if v > 0:
                        sl = len(b_results)
                        b_results.append(None)
                        plan.append(sl)
                        b_cur.append(sl)
                        if len(b_cur) == bdev.batch:
                            flush_bridge_rows()
                    else:
                        plan.append(-1)
                b_feed.append((gh, plan))
                continue
            if fdev is not None:
                v = native_core.greedy_export_fused(
                    gh, fdev.row(len(f_exp)), fdev.maxv)
                if v <= 0:
                    stats["host_graphs"] += 1
                    if native_core.greedy_solve_host(gh):
                        nxt.append(gh)
                    continue
                f_exp.append(gh)
                if len(f_exp) == fdev.batch:
                    flush_fused()
                continue
            v = native_core.greedy_export(gh, dev.row(len(g_exp)),
                                          dev.maxv)
            if v <= 0:
                stats["host_graphs"] += 1
                if native_core.greedy_solve_host(gh):
                    nxt.append(gh)
                continue
            g_exp.append(gh)
            if len(g_exp) == dev.batch:
                flush_greedy()
        flush_greedy()
        flush_fused()
        feed_bridges()
        flush_support()
        flush_ladder()
        active = nxt

    # replay in group order (determinism), host-fallback where ineligible
    for asmb, gv, gh in runs:
        if gh is None:
            asmb.resolve(gv)
        else:
            native_core.finish_group_device(gh)
    return True
