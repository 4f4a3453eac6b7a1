"""Pallas TPU kernels for the hot field ops.

These are the speed-of-light implementations of the inner loops
(SURVEY.md §7 "hard native component"): each kernel streams (L, BLOCK)
limb tiles HBM -> VMEM, performs the entire limb-convolution /
Montgomery-reduction chain on registers (zk_tpu.fields.limb_math), and
writes one output tile — ~200 B/element of HBM traffic instead of the
multi-KB intermediate traffic an unfused op-by-op formulation would pay.

The element axis rides the TPU lanes; the limb axis (L <= 16) sits on
sublanes.  Blocks default to 1024 lanes so a (16, 1024) uint32 tile is
64 KiB and a full mont_mul working set stays well inside VMEM.

Every kernel has a jnp fallback path (zk_tpu.fields.device) selected
automatically off-TPU, so the same call sites run under the CPU test
mesh and on real chips.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zk_tpu.fields import device as dev
from zk_tpu.fields import limb_math as lm
from zk_tpu.fields.field import Field

DEFAULT_BLOCK = 1024


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _row_specs(field: Field, n_in: int, block: int):
    spec = pl.BlockSpec(
        (field.n_limbs, block), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    return [spec] * n_in, pl.BlockSpec(
        (field.n_limbs, block), lambda i: (0, i), memory_space=pltpu.VMEM
    )


def _rows(ref, L):
    return [ref[i] for i in range(L)]


def _write(ref, rows):
    for i, r in enumerate(rows):
        ref[i] = r


# --------------------------------------------------------------------------
# elementwise kernels
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 3))
def mont_mul_pallas(field: Field, a, b, block: int = DEFAULT_BLOCK):
    """Elementwise Montgomery product on (L, N) tiles; N % block == 0."""
    L = field.n_limbs

    def kernel(a_ref, b_ref, o_ref):
        _write(o_ref, lm.mont_mul(field, _rows(a_ref, L), _rows(b_ref, L)))

    n = a.shape[-1]
    in_specs, out_spec = _row_specs(field, 2, block)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid=(n // block,),
        in_specs=in_specs,
        out_specs=out_spec,
    )(a, b)


@functools.partial(jax.jit, static_argnums=(0, 4))
def lerp_pallas(field: Field, left, right, r, block: int = DEFAULT_BLOCK):
    """Fold step left - r*(left-right); r is a (L, 1) Montgomery scalar."""
    L = field.n_limbs

    def kernel(l_ref, rt_ref, r_ref, o_ref):
        r_rows = [r_ref[i] for i in range(L)]
        _write(
            o_ref,
            lm.lerp(field, _rows(l_ref, L), _rows(rt_ref, L), r_rows),
        )

    n = left.shape[-1]
    grid = (n // block,)
    row = pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    scal = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid=grid,
        in_specs=[row, row, scal],
        out_specs=row,
    )(left, right, r)


# --------------------------------------------------------------------------
# dispatch helpers: pallas on TPU, jnp elsewhere
# --------------------------------------------------------------------------


def mont_mul(field: Field, a, b):
    n = a.shape[-1]
    if on_tpu() and a.ndim == 2 and b.shape == a.shape and n % DEFAULT_BLOCK == 0:
        return mont_mul_pallas(field, a, b)
    return dev.mont_mul(field, a, b)


def lerp(field: Field, left, right, r):
    n = left.shape[-1]
    if (
        on_tpu()
        and left.ndim == 2
        and right.shape == left.shape
        and n % DEFAULT_BLOCK == 0
    ):
        r2 = r.reshape(field.n_limbs, 1)
        return lerp_pallas(field, left, right, r2)
    return dev.lerp(field, left, right, r)
