import os

# Tests run on CPU with a virtual 8-device mesh so sharding/collective paths
# are exercised without TPU hardware (SURVEY.md §4d).  Note: the environment
# may pre-import jax with a TPU platform via sitecustomize, so setting
# JAX_PLATFORMS in os.environ is not enough — switch via jax.config before
# the backend initializes.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Golden parity tests compare against float64 scipy/numpy references.
jax.config.update("jax_enable_x64", True)
