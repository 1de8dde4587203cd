"""Test configuration: run all tests on a virtual 8-device CPU mesh.

The driver benches on a real TPU chip; tests must be runnable anywhere,
so we force the CPU backend with 8 virtual devices BEFORE jax initializes
(multi-host simulation strategy, SURVEY.md §4).

NOTE: in the axon-tunneled environment, JAX_PLATFORMS=cpu is silently
ignored by the platform plugin — JAX_PLATFORM_NAME (and
jax.config.update('jax_platforms', ...)) do work. Set all of them.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")
