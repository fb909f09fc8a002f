"""
Test configuration: force CPU backend with 8 virtual devices (multi-chip
sharding tests run on a virtual mesh) and float64.  Must run before jax
imports anywhere.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# the image's sitecustomize force-registers the axon TPU backend via
# jax.config (which wins over JAX_PLATFORMS env); tests run on 8 virtual
# CPU devices, so force the platform back
jax.config.update("jax_platforms", "cpu")
