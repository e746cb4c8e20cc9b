"""Test configuration: force CPU with 8 virtual devices.

Multi-device sharding tests run on a virtual 8-device CPU mesh (the JAX-native
"fake cluster"); numerical tests run in float32 on CPU for determinism.
Must set env vars before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize overrides JAX_PLATFORMS at interpreter
# start; jax.config wins over it.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

from e4s_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()
