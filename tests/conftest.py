"""Test harness config: run JAX on a simulated 8-device CPU mesh.

Multi-chip hardware is not available in CI; collective-path tests run on
XLA's host-platform device simulation (SURVEY.md §4 "fake backend").
The same test code runs unmodified on a real ICI/DCN mesh.
Must run before anything imports jax.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
