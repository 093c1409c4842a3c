import os
import sys

# Tests run on a virtual 8-device CPU mesh (multi-chip shardings are
# validated without TPU hardware; the driver dry-runs the real thing).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The session env pins JAX_PLATFORMS=axon (remote TPU) and registers the
# backend at interpreter start, so the env var alone is not enough — force
# the CPU backend through the config API before any computation runs.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
