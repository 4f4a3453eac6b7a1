"""Multi-chip execution: mesh construction + sharded protocol kernels.

The reference is single-threaded Rust; every distribution strategy here
is TPU-native by construction (SURVEY.md §2 parallelism table):

  * hypercube tables shard like a long sequence axis — the flat index is
    viewed as [w | s] with the s (lane) axis split across the mesh, so
    the per-round fold of variable 0 (the w MSB) stays entirely
    shard-local until the table is smaller than the mesh;
  * round-poly sums are per-shard partial sums + one psum per point;
  * the 4-step NTT exchanges its middle transpose with a single
    all_to_all over the mesh axis;
  * GKR layer handoff is replicated small state (no pipelining —
    Fiat-Shamir makes layers sequential, SURVEY.md §2).

Collectives are XLA's (psum / all_to_all) via jax.shard_map over a
jax.sharding.Mesh — ICI within a slice, DCN across slices; no hand-rolled
communication layer exists or is needed.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401

from zk_tpu.parallel.sumcheck import ShardedStack, ShardedSumcheckProver  # noqa: F401


def make_mesh(n_devices: int | None = None, axis: str = "x") -> Mesh:
    """1D device mesh over the first n_devices (default: all)."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
    # Auto axis type: classic shard_map/GSPMD semantics (jax >= 0.9
    # defaults new meshes to Explicit mode, which requires set_mesh scopes)
    return jax.make_mesh(
        (n_devices,),
        (axis,),
        devices=devices[:n_devices],
        axis_types=(jax.sharding.AxisType.Auto,),
    )
