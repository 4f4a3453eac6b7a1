"""Distributed Bailey 4-step NTT: butterflies exchanged via all_to_all.

The n = n1 * n2 transform viewed as an (n1, n2) row-major matrix:
column DFTs of length n1, twiddle by w^(i2*k1), row DFTs of length n2
(see zk_tpu.ntt._four_step for the single-chip indexing proof).  Across
a mesh the i2 (column-index) axis is sharded, so:

  step 1: each device runs complete length-n1 column ladders locally;
  step 2: local twiddle multiply (the twiddle table is sharded the same
          way);
  step 3: ONE all_to_all swaps the sharded axis from i2 to k1 — this is
          the "butterfly stages exchanged all-to-all" of the north star
          (BASELINE.json:5): all cross-device data motion of the whole
          transform happens in this single collective;
  step 4: local length-n2 row ladders; output stays sharded on k1.

Returns the (L, n2, n1) result sharded on the last (k1) axis, natural
DFT values: X[k2*n1 + k1] = out[:, k2, k1].  `gather_natural` flattens
to the reference's natural order on host.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from zk_tpu.fields import device as dev
from zk_tpu.fields.field import Field
from zk_tpu.ntt import _ladder_body, _plan, _twiddle_base_row, _twiddle_table

AXIS = "x"


def ntt_sharded(
    mesh: Mesh, field: Field, data: jnp.ndarray, inverse: bool = False
) -> jnp.ndarray:
    """Distributed NTT of a (L, n) Montgomery limb tensor.

    Returns (L, n2, n1) sharded on the k1 axis (see module docstring).
    """
    L, n = data.shape
    if n & (n - 1):
        raise ValueError("values must be a power of 2")
    d_mesh = mesh.devices.size
    logn = n.bit_length() - 1
    n1 = 1 << (logn // 2)
    n2 = n // n1
    if n2 % d_mesh or n1 % d_mesh:
        raise ValueError(
            f"both NTT factors ({n1}, {n2}) must be divisible by mesh size {d_mesh}"
        )

    p1 = _plan(field, n1, inverse)
    p2 = _plan(field, n2, inverse)
    twid = _twiddle_table(field, n1, n2, _twiddle_base_row(field, n, n1, inverse))

    # (L, n2, n1): row index i2 (sharded), column index i1
    a = data.reshape(L, n1, n2).transpose(0, 2, 1)
    shard_rows = NamedSharding(mesh, P(None, AXIS, None))
    a = jax.device_put(a, shard_rows)
    twid = jax.device_put(twid, shard_rows)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, AXIS, None), P(None, AXIS, None)),
        out_specs=P(None, None, AXIS),
    )
    def four_step_local(a_loc, twid_loc):
        # a_loc: (L, n2/D, n1) — full columns, local row slice
        y = _ladder_body(field, a_loc, *p1)  # column DFTs -> [i2_loc, k1]
        y = dev.mont_mul(field, y, twid_loc)  # * w^(i2*k1)
        # ONE all_to_all: split k1 across devices, gather full i2
        y = jax.lax.all_to_all(y, AXIS, split_axis=2, concat_axis=1, tiled=True)
        # y: (L, n2, n1/D) — full rows, local k1 slice; row DFTs over i2
        z = _ladder_body(field, y.transpose(0, 2, 1), *p2)  # [k1_loc, k2]
        return z.transpose(0, 2, 1)  # (L, n2, n1/D)

    return four_step_local(a, twid)


def gather_natural(field: Field, out3) -> jnp.ndarray:
    """(L, n2, n1) 4-step output -> (L, n) natural-order DFT on one device."""
    a = jnp.asarray(jax.device_get(out3))
    L, n2, n1 = a.shape
    # X[k2*n1 + k1] = out[:, k2, k1]
    return a.reshape(L, n1 * n2)
