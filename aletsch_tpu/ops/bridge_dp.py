"""Batched bottleneck-path DP over dense splice-graph adjacency.

Both hot DPs of the assembler are max-min ("bottleneck") path problems over
DAGs whose vertex order is topological (splice-graph vertices are genome-
ordered; graph_builder only creates i < j edges):

- the bridging DP scores candidate mate paths by their minimum edge weight
  (bridge/bridge_solver.cc:484-530; the top-1 stack entry is exactly the
  bottleneck), and
- greedy decomposition repeatedly extracts the max-bottleneck source->sink
  path (rnacore/splice_graph.cc:819-885).

This kernel evaluates, for a batch of padded bundles, the all-pairs
source-conditioned bottleneck table T[b, s, v] = best min-edge weight over
paths s -> v, by a sequential scan over target vertices with the (max, min)
semiring vectorized across batch and sources.  O(B * V^2) work per step,
V steps; runs on the VPU under jit and shards over the bundle axis.
"""

from __future__ import annotations

import numpy as np

NEG = -1.0e18
POS = 1.0e18

_JIT = {}


def _build(jnp, jax):
    def bottleneck_all_sources(W):
        """W: [B, V, V] edge weights (<=0 means absent, upper-triangular).

        Returns T: [B, V, V] with T[b, s, v] = bottleneck score of the best
        s->v path (POS on the diagonal, NEG if unreachable).
        """
        B, V, _ = W.shape
        Wm = jnp.where(W > 0, W, NEG)
        T0 = jnp.full((B, V, V), NEG)
        eye = jnp.eye(V) * (POS - NEG) + NEG
        T0 = jnp.maximum(T0, eye[None, :, :])

        def step(v, T):
            # cand[b, s, i] = min(T[b, s, i], W[b, i, v])
            cand = jnp.minimum(T, Wm[:, :, v][:, None, :])
            best = jnp.max(cand, axis=2)                  # [B, S]
            cur = T[:, :, v]
            new = jnp.maximum(cur, best)
            return T.at[:, :, v].set(new)

        T = jax.lax.fori_loop(1, V, step, T0)
        return T

    return bottleneck_all_sources


def get_bottleneck_fn():
    if "fn" in _JIT:
        return _JIT["fn"]
    import jax
    import jax.numpy as jnp
    fn = jax.jit(_build(jnp, jax))
    _JIT["fn"] = fn
    return fn


def bottleneck_all_sources_host(W):
    """Reference numpy implementation (oracle for the kernel)."""
    W = np.asarray(W, dtype=np.float64)
    B, V, _ = W.shape
    Wm = np.where(W > 0, W, NEG)
    T = np.full((B, V, V), NEG)
    for b in range(B):
        np.fill_diagonal(T[b], POS)
    for v in range(1, V):
        cand = np.minimum(T, Wm[:, :, v][:, None, :])
        best = cand.max(axis=2)
        T[:, :, v] = np.maximum(T[:, :, v], best)
    return T


def dense_adjacency(gr, V=None):
    """SpliceGraph -> padded dense weight matrix (max over parallel edges)."""
    n = gr.num_vertices()
    V = V or n
    W = np.zeros((V, V), dtype=np.float32)
    for e in gr.edges():
        w = gr.get_edge_weight(e)
        if e.s < V and e.t < V and w > W[e.s, e.t]:
            W[e.s, e.t] = w
    return W
