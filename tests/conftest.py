"""Test harness: force an 8-device virtual CPU mesh before JAX backends init.

The standard JAX fake-backend technique for exercising pjit sharding and
psum collectives without TPU hardware (SURVEY.md §4). Note: this image's
sitecustomize registers the `axon` TPU plugin and overrides JAX_PLATFORMS at
interpreter start, so we must force the platform via jax.config AFTER import
(backends initialize lazily, so this still wins).
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
