"""Single-host multi-process execution over region shards.

Replaces the reference's thread pool (boost::asio, meta/incubator.cc:24)
with process-level data parallelism over the region grid: profile once into
a cache, launch one subprocess per job for a disjoint region shard, merge
the per-shard transcript sets deterministically (same machinery as the
multi-host path, parallel/distributed.py) — output is job-count invariant.

Workers are plain subprocesses (parallel/worker.py), not multiprocessing
forks: this runtime imports JAX into every interpreter via sitecustomize,
which makes fork unsafe after backend init and spawn re-execute __main__.
"""

from __future__ import annotations

import copy
import os
import pickle
import subprocess
import sys
import tempfile

from ..constants import DEFAULT
from .distributed import merge_shards


def _spawn_worker(args):
    # keep the caller's cwd (relative paths in the BAM list must resolve);
    # make the package importable in the child via PYTHONPATH instead
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env = dict(os.environ)
    env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
    # this environment pins PYTHONDONTWRITEBYTECODE=1, which makes every
    # worker recompile ~370 modules (~1.2 s, measured via cProfile's
    # importlib compile time); give workers a shared bytecode cache
    env.pop("PYTHONDONTWRITEBYTECODE", None)
    env.setdefault("PYTHONPYCACHEPREFIX", "/tmp/aletsch_pycache")
    return subprocess.Popen([sys.executable, "-m",
                             "aletsch_tpu.parallel.worker"] + args, env=env)


def run_parallel(params, n_jobs):
    """Full assembly using n_jobs worker subprocesses; writes outputs."""
    if n_jobs <= 1:
        from ..meta.incubator import Incubator
        inc = Incubator(params)
        inc.resolve()
        return inc
    with tempfile.TemporaryDirectory(prefix="aletsch_jobs_") as tmp:
        cfg0 = params[DEFAULT]
        prof_dir = cfg0.profile_dir
        if not prof_dir and n_jobs <= (os.cpu_count() or 1):
            # few workers: each self-profiles concurrently (profiling is
            # deterministic, so duplicated work yields identical stats and
            # the serial warm-up phase disappears from the critical path)
            prof_dir = ""
        elif not prof_dir:
            # profile once so workers skip previewing
            prof_dir = os.path.join(tmp, "profiles")
            os.makedirs(prof_dir, exist_ok=True)
            pparams = [copy.deepcopy(p) for p in params]
            for p in pparams:
                p.profile_only = True
                p.profile_dir = prof_dir
            from ..meta.incubator import Incubator
            pinc = Incubator(pparams)
            pinc.resolve()
            # sweep region tables once so every shard worker loads the
            # sidecar instead of re-scanning; sweeps are numpy/native-bound
            # so a thread pool overlaps them across samples
            from concurrent.futures import ThreadPoolExecutor

            def sweep(sp):
                sp.save_profile(prof_dir)
                cfg = pparams[sp.data_type]
                sp.set_batch_boundaries(cfg.min_bundle_gap, cfg.max_read_span)
                sp.save_regions(prof_dir, cfg.min_bundle_gap,
                                cfg.max_read_span)

            nw = min(n_jobs, len(pinc.samples), os.cpu_count() or 1)
            if nw > 1:
                with ThreadPoolExecutor(max_workers=nw) as ex:
                    list(ex.map(sweep, pinc.samples))
            else:
                for sp in pinc.samples:
                    sweep(sp)
        wparams = [copy.deepcopy(p) for p in params]
        for p in wparams:
            p.profile_dir = prof_dir
        params_path = os.path.join(tmp, "params.pkl")
        with open(params_path, "wb") as fh:
            pickle.dump(wparams, fh)
        dumps = [os.path.join(tmp, "shard%d.pkl" % h) for h in range(n_jobs)]
        procs = [_spawn_worker(["shard", params_path, str(h), str(n_jobs),
                                dumps[h]])
                 for h in range(n_jobs)]
        for h, p in enumerate(procs):
            rc = p.wait()
            if rc != 0:
                raise RuntimeError("shard worker failed with exit %d" % rc)
            if not os.path.exists(dumps[h]):
                # e.g. the worker exited cleanly after failing to open inputs
                raise RuntimeError(
                    "shard worker %d produced no output (%s); check its "
                    "stderr above for input errors" % (h, dumps[h]))
        mparams = [copy.deepcopy(p) for p in params]
        for p in mparams:
            p.profile_dir = prof_dir
        return merge_shards(mparams, dumps)
