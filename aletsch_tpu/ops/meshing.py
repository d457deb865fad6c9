"""Device-mesh plumbing for the wave kernels (SURVEY §2.8).

When more than one JAX device is visible (a real multi-chip slice, or the
virtual 8-device CPU mesh the tests force), every wave batch is laid out
over a 1-D ('b',) mesh with the batch axis sharded: each device owns B/n
rows of the padded batch and XLA inserts the collectives (the fused
drain's `while_loop` convergence test is a cross-device all-reduce every
iteration).  With one device everything degrades to the plain path.

The kernels' batch objects (ops/greedy_fused.py, ops/bridge_topk.py,
ops/support.py) call `shard_args` on their inputs right before dispatch —
live pipeline tensors, not captures — and account per-dispatch bytes so
the multichip dryrun can assert the scaling shape (bytes moved, dispatch
counts per device) without real multi-chip hardware.
"""

from __future__ import annotations

import numpy as np

_CACHE = {"mesh": None, "checked": False}


def get_mesh():
    """(mesh, batch_sharding, replicated_sharding) or None (single dev)."""
    if _CACHE["checked"]:
        return _CACHE["mesh"]
    _CACHE["checked"] = True
    try:
        import jax
        # Local devices only: under jax.distributed each process drives its
        # own region shard, so wave batches shard over the process-local
        # devices; the cross-process axis is the transcript-set all-gather
        # (parallel/jaxdist.py).  Single-process: local == global.
        devs = jax.local_devices()
        if len(devs) <= 1:
            return None
        from jax.sharding import Mesh, NamedSharding, PartitionSpec
        mesh = Mesh(np.array(devs), ("b",))
        _CACHE["mesh"] = (mesh, NamedSharding(mesh, PartitionSpec("b")),
                          NamedSharding(mesh, PartitionSpec()))
    except Exception:
        _CACHE["mesh"] = None
    return _CACHE["mesh"]


def shard_args(batched, replicated, stats):
    """device_put the live wave tensors onto the mesh (batch axis sharded
    for `batched`, replicated for `replicated`); single-device passthrough.
    Returns (batched', replicated').  Accounts mesh stats in place."""
    m = get_mesh()
    if m is None:
        return batched, replicated
    import jax
    mesh, bshard, rshard = m
    n = mesh.size
    out_b = []
    nbytes = 0
    for a in batched:
        if a.shape[0] % n != 0:     # unshardable batch: replicate
            out_b.append(jax.device_put(a, rshard))
        else:
            out_b.append(jax.device_put(a, bshard))
        nbytes += a.nbytes
    out_r = []
    for a in replicated:
        out_r.append(jax.device_put(a, rshard))
        nbytes += a.nbytes
    stats["mesh_devices"] = n
    stats["mesh_dispatches"] = stats.get("mesh_dispatches", 0) + 1
    stats["mesh_bytes_in"] = stats.get("mesh_bytes_in", 0) + nbytes
    return out_b, out_r


def account_out(outs, stats):
    """Accumulate output bytes for the mesh accounting."""
    if get_mesh() is None:
        return
    stats["mesh_bytes_out"] = stats.get("mesh_bytes_out", 0) + \
        sum(int(getattr(o, "nbytes", 0)) for o in outs)
