"""jax.distributed multi-process execution: live payloads over collectives.

The reference is a single process; its cross-sample state is shared memory
guarded by mutexes (meta/incubator.cc:523-611, SURVEY §2.8).  The TPU-native
scale-out replaces that with SPMD processes joined by a JAX process group:

  1. every process calls jax.distributed.initialize() against one
     coordinator (DCN analogue: the gloo/TCP backend on CPU hosts, ICI/DCN
     on real TPU pods);
  2. each process assembles a disjoint region shard of the (chrm, region)
     grid over ALL samples (parallel/distributed.py::region_shard_filter,
     so per-locus combined-graph inputs are identical to a 1-host run);
  3. the per-shard transcript sets — the pipeline's own live output state,
     not captures — are pickled to uint8 tensors and exchanged with TWO
     collectives: an all-gather of lengths, then an all-gather of the
     padded byte tensors (jax.experimental.multihost_utils rides
     jit+NamedSharding over the global process mesh);
  4. process 0 merges with the same deterministic TranscriptSet union the
     single-host postprocess uses and writes all outputs; the result is
     bitwise identical to 1-process execution (tests/test_jaxdist.py).

Within each process the wave batches still shard over the process-LOCAL
device mesh (ops/meshing.py); this module adds the cross-process axis.
"""

from __future__ import annotations

import os
import pickle

from .distributed import merge_payloads, region_shard_filter
from ..meta.incubator import Incubator


def _allgather_bytes(payload, np_mod=None):
    """All-gather one bytes blob per process; returns list[bytes] ordered by
    process id.  Two collectives: int64 lengths, then padded uint8 bodies."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    n = jax.process_count()
    # i32 lengths: payloads are far below 2 GB and x64 is off by default
    # (an i64 request would warn + truncate to i32 anyway)
    ln = jnp.asarray([len(payload)], dtype=jnp.int32)
    lens = np.asarray(multihost_utils.process_allgather(ln)).reshape(n)
    m = int(lens.max())
    buf = np.zeros((max(m, 1),), np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(jnp.asarray(buf)))
    gathered = gathered.reshape(n, -1)
    return [gathered[p, : lens[p]].tobytes() for p in range(n)]


def _profile_sample_shard(inc, params, process_id, num_processes):
    """Profile only the samples this process owns (sid % P == pid), then
    all-gather the filled SampleProfile objects so every process holds
    the complete profile set; the deterministic borrow pass then runs
    identically everywhere (Incubator.borrow_profiles)."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    from ..meta.incubator import _prep_sample

    owned = [sp for sp in inc.samples
             if sp.sample_id % num_processes == process_id]
    nw = min(len(owned), os.cpu_count() or 1) or 1
    if len(owned) > 1 and nw > 1:
        with ThreadPoolExecutor(max_workers=nw) as ex:
            owned = list(ex.map(lambda sp: _prep_sample((sp, params)),
                                owned))
    else:
        owned = [_prep_sample((sp, params)) for sp in owned]
    blobs = _allgather_bytes(pickle.dumps(owned, protocol=4))
    merged = {}
    for b in blobs:
        for sp in pickle.loads(b):
            merged[sp.sample_id] = sp
    assert len(merged) == len(inc.samples), \
        "distributed profiling lost samples (%d/%d)" % (len(merged),
                                                        len(inc.samples))
    inc.samples = [merged[i] for i in range(len(inc.samples))]
    inc.borrow_profiles()


def launch_jax_distributed(argv, num_processes):
    """Single-command local launcher: spawn `num_processes` CLI workers
    that join one jax.distributed group on a free localhost port and wait
    for them.  `argv` is the CLI argument list WITHOUT the --jax_dist /
    --jax_dist_launch flags (each worker re-parses it).  On a multi-host
    deployment run one `--jax_dist <pid> <P> <host:port>` process per
    host instead."""
    import socket
    import subprocess
    import sys

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    coord = "127.0.0.1:%d" % s.getsockname()[1]
    s.close()
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env = dict(os.environ)
    env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
    # shared bytecode cache (the environment pins PYTHONDONTWRITEBYTECODE)
    env.pop("PYTHONDONTWRITEBYTECODE", None)
    env.setdefault("PYTHONPYCACHEPREFIX", "/tmp/aletsch_pycache")
    procs = [subprocess.Popen(
        [sys.executable, "-m", "aletsch_tpu"] + list(argv) +
        ["--jax_dist", str(pid), str(num_processes), coord], env=env)
        for pid in range(num_processes)]
    rc = 0
    for p in procs:
        rc |= p.wait()
    if rc != 0:
        raise RuntimeError("jax_dist worker failed (rc=%d)" % rc)


def run_jax_distributed(params, process_id, num_processes,
                        coordinator="127.0.0.1:19761"):
    """Run this process's region shard under jax.distributed; process 0
    merges the all-gathered shard payloads and writes the outputs.

    Multi-process on one TPU chip would deadlock the single-tenant relay
    (and two processes sharing a chip is never the deployment shape), so
    the compute platform is forced to CPU here unless the environment
    explicitly claims real per-process accelerators.
    """
    import jax

    if os.environ.get("ALETSCH_JAXDIST_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ALETSCH_JAXDIST_PLATFORM"])
    else:
        jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    try:
        inc = Incubator(
            params, region_filter=region_shard_filter(process_id, num_processes))
        # Sample-sharded profiling (round-4 verdict item 4): the reference
        # profiles each sample exactly once (meta/incubator.cc:116-196);
        # here sample i is profiled only by process i % P and the full
        # profiles ride the same all-gather the transcript payloads use,
        # so the group's total profiling CPU matches a single process.
        with inc.tracer.phase("index-inputs"):
            inc.read_bam_list()
            inc.build_sample_index()
        with inc.tracer.phase("profile-samples"):
            _profile_sample_shard(inc, params, process_id, num_processes)
        inc.resolve(write_outputs=False, preprofiled=True)
        payload = pickle.dumps(
            {"tts": inc.tts, "n_samples": len(inc.samples), "stats": inc.stats},
            protocol=4)
        blobs = _allgather_bytes(payload)
        if process_id == 0:
            return merge_payloads(params, [pickle.loads(b) for b in blobs])
        return inc
    finally:
        jax.distributed.shutdown()
