"""Single-host multi-process execution over region shards.

Replaces the reference's thread pool (boost::asio, meta/incubator.cc:24)
with process-level data parallelism over the region grid: profile once into
a cache, fork one worker per job for a disjoint region shard, merge the
per-shard transcript sets deterministically (same machinery as the
multi-host path, parallel/distributed.py) — output is job-count invariant.
"""

from __future__ import annotations

import copy
import multiprocessing as mp
import os
import tempfile

from ..constants import DEFAULT
from .distributed import merge_shards, run_region_shard


def _worker(args):
    params, host_id, n_jobs, dump = args
    run_region_shard(params, host_id, n_jobs, dump)
    return dump


def run_parallel(params, n_jobs):
    """Full assembly using n_jobs processes; writes the configured outputs."""
    if n_jobs <= 1:
        from ..meta.incubator import Incubator
        inc = Incubator(params)
        inc.resolve()
        return inc
    with tempfile.TemporaryDirectory(prefix="aletsch_jobs_") as tmp:
        cfg0 = params[DEFAULT]
        prof_dir = cfg0.profile_dir
        if not prof_dir:
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
            for sp in pinc.samples:
                sp.save_profile(prof_dir)
        wparams = []
        for h in range(n_jobs):
            ps = [copy.deepcopy(p) for p in params]
            for p in ps:
                p.profile_dir = prof_dir
            wparams.append(ps)
        dumps = [os.path.join(tmp, "shard%d.pkl" % h) for h in range(n_jobs)]
        import sys as _sys
        ctx = mp.get_context("spawn" if "jax" in _sys.modules else "fork")
        with ctx.Pool(n_jobs) as pool:
            pool.map(_worker, [(wparams[h], h, n_jobs, dumps[h])
                               for h in range(n_jobs)])
        mparams = [copy.deepcopy(p) for p in params]
        for p in mparams:
            p.profile_dir = prof_dir
        return merge_shards(mparams, dumps)
