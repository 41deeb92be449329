"""Test harness: force an 8-device virtual CPU platform before JAX import.

Multi-chip sharding logic is exercised on host-platform virtual devices (the
standard JAX trick) since real pods aren't available in CI. The reference has
no analogous test infrastructure (its only tests are pure-NumPy geometry,
``tests/test_UtilsCV.py``).
"""

import os

# The session sitecustomize imports JAX at interpreter startup with the TPU
# platform pinned, so env vars alone are too late — force CPU through the
# config API (effective until backends are initialized) as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
