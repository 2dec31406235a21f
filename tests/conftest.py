"""Test harness config: run on CPU with 8 virtual devices.

Multi-chip sharding/collective tests (SURVEY.md §4e) run against a fake
8-device host-platform mesh so psum/all_gather/ppermute paths are exercised
without a TPU pod.

The container's sitecustomize force-registers the ``axon`` TPU platform for
every interpreter, so the env var alone is not enough — we also override the
platform via ``jax.config`` before any backend is initialized.
"""

import os

_platform = os.environ.get("MH_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (must come after the env setup above)

jax.config.update("jax_platforms", _platform)
