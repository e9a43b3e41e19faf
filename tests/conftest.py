import os

# Force the CPU backend regardless of how the host environment registered a
# TPU plugin (the axon sitecustomize pins JAX_PLATFORMS at interpreter start,
# so the env var alone is not enough — the config update below is).
#
# Tests run on a virtual 8-device CPU mesh so sharding/collective paths
# compile and execute without real multi-chip hardware, and in f64 so
# gradient checks compare against central differences at reference
# tolerances.
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
