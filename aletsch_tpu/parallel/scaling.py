"""Scaling-efficiency measurement for the sharded batched step.

Measures bundles/s of the jitted assembly wave at increasing mesh sizes
(weak scaling: the batch grows with the device count), reporting efficiency
relative to the single-device rate.  On a real pod slice this rides ICI; in
tests it runs on the virtual CPU mesh to validate the harness itself.
"""

from __future__ import annotations

import time


from .mesh import build_sharded_step, example_batch, make_mesh


def measure_scaling(device_counts=None, B_per_dev=8, V=32, reps=5):
    """Returns [(n_devices, waves_per_s, bundles_per_s, efficiency)]."""
    import jax
    ndev = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= ndev]
    results = []
    base_rate = None
    for d in device_counts:
        mesh = make_mesh(d)
        s = mesh.shape["sample"]
        fn = build_sharded_step(mesh)
        B = B_per_dev * mesh.shape["data"]
        args = example_batch(B=B, V=V, Ns=max(2, s))
        out = fn(*args)
        for o in out:
            o.block_until_ready()
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        for o in out:
            o.block_until_ready()
        dt = (time.time() - t0) / reps
        waves = 1.0 / dt
        bundles = B / dt
        if base_rate is None:
            base_rate = bundles
        eff = bundles / (base_rate * d) if base_rate else 0.0
        results.append((d, waves, bundles, eff))
    return results


def format_scaling(results):
    lines = ["scaling (weak, bundles/s):"]
    for d, waves, bundles, eff in results:
        lines.append("  %2d dev: %8.1f bundles/s  eff %.2f" % (d, bundles, eff))
    return "\n".join(lines)


def main():
    """CLI entry for subprocess scaling runs: forces the CPU platform (the
    sitecustomize pins axon) so a virtual multi-device mesh is available via
    XLA_FLAGS=--xla_force_host_platform_device_count=N."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    print(format_scaling(measure_scaling()))


if __name__ == "__main__":
    main()
