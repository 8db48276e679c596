import os

# All unit tests run on a virtual 8-device CPU mesh; the real TPU chip is
# reserved for bench.py.  The axon TPU plugin ignores the JAX_PLATFORMS env
# var, so platform selection must go through jax.config before any
# computation runs.  XLA_FLAGS must be set before jax initializes backends.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
