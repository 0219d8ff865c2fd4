"""Test configuration.

Tests run on CPU with an 8-device virtual mesh so the multi-chip domain
decomposition path (parallel/) is exercised without TPU hardware, and with
x64 enabled so quadrature/consistency checks have headroom (the engine still
computes in the dtype of its state arrays — simulations pin float32).
"""
import os

# The environment pins JAX_PLATFORMS=axon (a tunneled remote TPU) and a
# sitecustomize imports jax at interpreter start, so env vars alone are too
# late — use jax.config to force the local CPU backend for tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
