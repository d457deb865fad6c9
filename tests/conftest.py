import os

# Run tests on a virtual 8-device CPU mesh so sharding paths are exercised
# without touching TPU hardware.  The runtime environment may pre-register a
# TPU platform ("axon") via sitecustomize and pin jax_platforms before this
# file runs, so an env var alone is not enough: force the config explicitly.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
