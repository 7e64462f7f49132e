"""Test configuration: run JAX on CPU with an 8-device virtual mesh.

Mirrors the multi-host test substitute described in SURVEY.md §4: sharded paths
are validated against single-device results on a virtual CPU mesh instead of a
real pod slice.

The container boots with an `axon` TPU platform pre-registered (sitecustomize)
and JAX_PLATFORMS=axon exported, so the platform must be forced back to cpu via
jax.config — env vars alone are too late.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = os.environ.get("LVMT_TEST_PLATFORM", "cpu")

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", False)
