"""Device-mesh sharding for the batched assembly step.

The assembler's parallel structure (SURVEY §2.8): bundles are embarrassingly
data-parallel; cross-sample merging needs a reduction over the sample axis.
We express this as a 2-D mesh ('data', 'sample'):

- padded bundle tensors (adjacency, coverage segments, splice incidence)
  shard over 'data';
- per-sample junction-support tensors shard over 'sample' and reduce with a
  mesh-wide sum (XLA lowers this to an all-reduce riding ICI);
- the pairwise-similarity matmul all-gathers the incidence matrix over
  'data' implicitly through the sharded contraction.

The same jitted step runs single-chip (trivial mesh) and multi-chip.
"""

from __future__ import annotations

import numpy as np

from ..ops.bridge_dp import NEG, POS


def make_mesh(n_devices=None, sample_axis=None):
    import jax
    from jax.sharding import Mesh
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if sample_axis is None:
        sample_axis = 2 if n % 2 == 0 and n >= 2 else 1
    data_axis = n // sample_axis
    arr = np.array(devs).reshape(data_axis, sample_axis)
    return Mesh(arr, ("data", "sample"))


def _step_impl(jnp, jax):
    def step(W, seg_vals, seg_lens, seg_mask, span, inc, jsup):
        """One batched assembly compute wave.

        W:        [B, V, V]  bundle adjacency (bottleneck DP)
        seg_*:    [B, S]     coverage segments (region stats)
        span:     [B]
        inc:      [B, P]     splice incidence (pairwise similarity matmul)
        jsup:     [Ns, B, J] per-sample junction support (sum over samples)
        """
        B, V, _ = W.shape
        Wm = jnp.where(W > 0, W, NEG)
        eye = jnp.eye(V) * (POS - NEG) + NEG
        T0 = jnp.broadcast_to(eye[None, :, :], (B, V, V)) + jnp.zeros_like(W)

        def dp_step(v, T):
            cand = jnp.minimum(T, Wm[:, :, v][:, None, :])
            best = jnp.max(cand, axis=2)
            return T.at[:, :, v].set(jnp.maximum(T[:, :, v], best))

        T = jax.lax.fori_loop(1, V, dp_step, T0)
        bottleneck = T[:, 0, V - 1]

        from ..ops.coverage import region_stats_traced
        ave, dev, mx = region_stats_traced(jnp, seg_vals, seg_lens,
                                           seg_mask, span,
                                           empty_defaults=False)

        sim = jnp.dot(inc, inc.T, preferred_element_type=jnp.float32)

        support = jnp.sum(jsup, axis=0)      # reduce over the sample axis

        return bottleneck, ave, dev, mx, sim, support

    return step


def build_sharded_step(mesh):
    """jit the batched step with NamedShardings over the given mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    step = _step_impl(jnp, jax)

    def sh(*spec):
        return NamedSharding(mesh, P(*spec))

    in_shardings = (
        sh("data", None, None),      # W
        sh("data", None),            # seg_vals
        sh("data", None),            # seg_lens
        sh("data", None),            # seg_mask
        sh("data"),                  # span
        sh("data", None),            # inc
        sh("sample", "data", None),  # jsup
    )
    out_shardings = (
        sh("data"), sh("data"), sh("data"), sh("data"),
        sh("data", None), sh("data", None),
    )
    return jax.jit(step, in_shardings=in_shardings,
                   out_shardings=out_shardings)


def example_batch(B=8, V=32, S=16, P_=64, Ns=2, J=16, seed=0):
    """Tiny padded batch for compile checks and benchmarks."""
    rng = np.random.default_rng(seed)
    W = np.triu(rng.uniform(0, 10, size=(B, V, V)).astype(np.float32), k=1)
    W *= (rng.uniform(size=(B, V, V)) < 0.3)
    seg_vals = rng.integers(0, 50, size=(B, S)).astype(np.float32)
    seg_lens = rng.integers(1, 200, size=(B, S)).astype(np.float32)
    seg_mask = (rng.uniform(size=(B, S)) < 0.8).astype(np.float32)
    span = np.maximum((seg_lens * seg_mask).sum(axis=1), 1.0).astype(np.float32)
    inc = (rng.uniform(size=(B, P_)) < 0.2).astype(np.float32)
    jsup = rng.uniform(0, 5, size=(Ns, B, J)).astype(np.float32)
    return W, seg_vals, seg_lens, seg_mask, span, inc, jsup
