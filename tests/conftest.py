"""Test harness config: run JAX on a simulated 8-device CPU mesh.

Multi-chip hardware is not available in CI; collective-path tests run on
XLA's host-platform device simulation (SURVEY.md §4 "fake backend").
The same test code runs unmodified on a real ICI/DCN mesh.

NOTE: this image's sitecustomize registers the `axon` TPU-tunnel platform
and forces it via jax.config.update("jax_platforms", "axon,cpu"), which
overrides JAX_PLATFORMS from the environment.  A config.update AFTER that
registration wins, so we pin the cpu backend here before any backend is
initialized.  Tests must never touch the (single, remote) real chip —
that's bench.py's job.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# unrolled limb graphs compile slowly on XLA:CPU; cache them across runs
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_zk_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
