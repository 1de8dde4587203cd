"""Test configuration: run all tests on a virtual 8-device CPU mesh.

The driver benches on a real TPU chip; tests must be runnable anywhere, so we
force the CPU backend with 8 virtual devices BEFORE jax initializes. This
mirrors the multi-host simulation strategy in SURVEY.md §4.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
