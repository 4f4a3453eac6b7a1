"""Fused Pallas round kernels + host-int tail for the sumcheck prover.

Three execution tiers, picked per round by table size and backend:

  * pallas  — large tables on TPU: one kernel computes all D+1 round-poly
    sums (streaming left/right half-tiles, products and lane reductions
    on registers, relaxed uint32 limb accumulation across grid steps);
    a second kernel folds every factor at the challenge.
  * jnp     — CPU test mesh / fallback: the fused jnp graphs from
    zk_tpu.sumcheck (same math, XLA-fused).
  * host    — tail rounds on tiny tables (< TAIL_SIZE): exact Python
    ints.  Avoids per-size kernel compiles and per-round dispatch
    latency for the cheap end of the fold (SURVEY.md §7 risk 4).

Cross-grid sum accumulation stays exact without per-block modular adds:
each grid step contributes a canonical (< p) Montgomery-reduced block
sum whose 16-bit limbs are raw-accumulated in uint32 — safe for up to
2^16 grid steps (tables to 2^27 per chip); the host performs the final
carry + mod p on decode.
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
from zk_tpu.fields.field import Field, LIMB_BITS
from zk_tpu.fields.pallas_kernels import on_tpu

U32 = jnp.uint32
_MASK = np.uint32((1 << LIMB_BITS) - 1)
_B = LIMB_BITS

TAIL_SIZE = 2048  # tables at/below this size finish on host ints
BLOCK = 1024
MAX_GRID = 1 << 15  # relaxed vector-accumulation overflow guard (2^16 * 2^15 < 2^32)


# --------------------------------------------------------------------------
# pallas kernels
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _round_sums_pallas(field: Field, degree: int, k: int, n: int, tables):
    """All D+1 round-poly sums for a (k, L, n) factor stack.

    Returns (degree+1, L, block) relaxed uint32 VECTOR accumulators: each
    grid step adds its product tile (Montgomery values < p, limbs < 2^16)
    elementwise, so after <= MAX_GRID steps every accumulator limb is
    < 2^31 — no in-kernel reduction or modular math at all.  The host
    finishes lane sums + carries + mod p exactly in uint64/bigint
    (decode_relaxed_sums).

    Point 0/1 take the left/right half products (no multiplies — the
    structural 0/1 fast path of evaluation_form.rs:60-63); points >= 2
    lerp with the constant scalar i (prover.rs:49-56 semantics).
    """
    L = field.n_limbs
    block = min(BLOCK, n // 2)
    grid = (n // 2) // block
    assert grid <= MAX_GRID

    consts = [
        lm.np_limbs((i * field.R) % field.p, L) for i in range(degree + 1)
    ]

    def kernel(left_ref, right_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        lefts = [[left_ref[t, i] for i in range(L)] for t in range(k)]
        rights = [[right_ref[t, i] for i in range(L)] for t in range(k)]
        for point in range(degree + 1):
            prod = None
            for t in range(k):
                if point == 0:
                    ev = lefts[t]
                elif point == 1:
                    ev = rights[t]
                else:
                    ev = lm.lerp(field, lefts[t], rights[t], consts[point])
                prod = ev if prod is None else lm.mont_mul(field, prod, ev)
            for i in range(L):
                o_ref[point, i, :] += prod[i]

    half = pl.BlockSpec((k, L, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    rhalf = pl.BlockSpec(
        (k, L, block), lambda i, g=grid: (0, 0, i + g), memory_space=pltpu.VMEM
    )
    acc_spec = pl.BlockSpec(
        (degree + 1, L, block), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((degree + 1, L, block), jnp.uint32),
        grid=(grid,),
        in_specs=[half, rhalf],
        out_specs=acc_spec,
    )(tables, tables)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _fold_pallas(field: Field, k: int, n: int, tables, r):
    """Fold (k, L, n) factor stack at challenge r -> (k, L, n/2)."""
    L = field.n_limbs
    block = min(BLOCK, n // 2)
    grid = (n // 2) // block

    def kernel(left_ref, right_ref, r_ref, o_ref):
        r_rows = [r_ref[i] for i in range(L)]
        for t in range(k):
            out = lm.lerp(
                field,
                [left_ref[t, i] for i in range(L)],
                [right_ref[t, i] for i in range(L)],
                r_rows,
            )
            for i in range(L):
                o_ref[t, i] = out[i]

    half = pl.BlockSpec((k, L, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    rhalf = pl.BlockSpec(
        (k, L, block), lambda i, g=grid: (0, 0, i + g), memory_space=pltpu.VMEM
    )
    r_spec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((k, L, n // 2), jnp.uint32),
        grid=(grid,),
        in_specs=[half, rhalf, r_spec],
        out_specs=half,
    )(tables, tables, r)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _fold_multi_pallas(field: Field, k: int, n: int, f: int, stack, rs):
    """Fold f consecutive MSB variables of a (k, L, n) stack in ONE pass.

    rs: (L, f) Montgomery scalars, column l = fold scalar for variable l.
    Returns (k, L, n >> f).  Each grid step reads 2^f input tiles at
    stride n/2^f and lerp-reduces them down a binary tree on registers:
    same 2^f - 1 multiplies per output element as f separate folds, but
    the table is streamed from HBM once instead of ~2x (geometric) — the
    fold chain is HBM-bound at production sizes, so a 4-variable fold is
    a ~3x traffic cut over the single-step chain.

    Tree order matches the reference's consecutive var-0 folds
    (evaluation_form.rs:54-72): level l pairs tiles j, j + 2^(f-1-l),
    i.e. elements differing in the current most-significant index bit.
    """
    L = field.n_limbs
    F = 1 << f
    out_n = n >> f
    block = min(BLOCK, out_n)
    grid = (out_n // block,)
    q = out_n // block

    def kernel(*refs):
        ins = refs[:F]
        rs_ref = refs[F]
        o_ref = refs[F + 1]
        for t in range(k):
            tiles = [[ins[j][t, i] for i in range(L)] for j in range(F)]
            m = F
            for l in range(f):
                r = [rs_ref[i, l : l + 1] for i in range(L)]
                tiles = [
                    lm.lerp(field, tiles[j], tiles[j + m // 2], r)
                    for j in range(m // 2)
                ]
                m //= 2
            for i in range(L):
                o_ref[t, i] = tiles[0][i]

    in_specs = [
        pl.BlockSpec(
            (k, L, block), lambda i, j=j: (0, 0, i + j * q), memory_space=pltpu.VMEM
        )
        for j in range(F)
    ]
    in_specs.append(
        pl.BlockSpec((L, f), lambda i: (0, 0), memory_space=pltpu.VMEM)
    )
    out_spec = pl.BlockSpec((k, L, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((k, L, out_n), jnp.uint32),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
    )(*([stack] * F), rs)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _block_sums_pallas(field: Field, F: int, n: int, stack):
    """F block sums (by the leading log2(F) index bits) of a (1, L, n)
    Montgomery stack -> (F, L, block) relaxed uint32 accumulators
    (_norm_block rows).  Grid step i accumulates its tile into row
    i // (grid/F); rows are visited consecutively, so the revisited
    output block stays resident in VMEM (standard Pallas reduction).

    These F sums determine the next log2(F) sumcheck round polynomials
    without re-reading the table: sums and folds commute exactly mod p
    (the fold is linear in the challenge), so p_j(0)/p_j(1) are lerps of
    block-sum halves — see _prove_chain's super-round phase.

    Bound: each row accumulates grid/F <= MAX_GRID tiles of proper
    Montgomery limbs (< 2^16), keeping every lane < 2^31."""
    L = field.n_limbs
    block = min(BLOCK, n // F)
    grid = n // block
    rows_per = grid // F
    assert rows_per >= 1 and rows_per <= MAX_GRID and grid % F == 0

    def kernel(x_ref, acc_ref):
        @pl.when(pl.program_id(0) % rows_per == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        for i in range(L):
            acc_ref[0, i, :] += x_ref[0, i]

    in_spec = pl.BlockSpec((1, L, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec(
        (1, L, block), lambda i, rp=rows_per: (i // rp, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((F, L, block), jnp.uint32),
        grid=(grid,),
        in_specs=[in_spec],
        out_specs=acc_spec,
    )(stack)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _fold_multi_sums_pallas(field: Field, n: int, f: int, F_out: int, stack, rs):
    """Single-factor _fold_multi_pallas that ALSO emits the folded
    table's F_out block sums in the same HBM pass (the next super-round's
    round-poly inputs — see _prove_chain).

    stack: (1, L, n); rs: (L, f) Montgomery fold scalars.  Returns
    (folded (1, L, n >> f), acc (F_out, L, block) relaxed accumulators).
    """
    L = field.n_limbs
    Fin = 1 << f
    out_n = n >> f
    block = min(BLOCK, out_n // F_out)
    grid = out_n // block
    rows_per = grid // F_out
    assert rows_per >= 1 and rows_per <= MAX_GRID and grid % F_out == 0

    def kernel(*refs):
        ins = refs[:Fin]
        rs_ref = refs[Fin]
        o_ref = refs[Fin + 1]
        acc_ref = refs[Fin + 2]

        @pl.when(pl.program_id(0) % rows_per == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        tiles = [[ins[j][0, i] for i in range(L)] for j in range(Fin)]
        m = Fin
        for l in range(f):
            r = [rs_ref[i, l : l + 1] for i in range(L)]
            tiles = [
                lm.lerp(field, tiles[j], tiles[j + m // 2], r)
                for j in range(m // 2)
            ]
            m //= 2
        for i in range(L):
            o_ref[0, i] = tiles[0][i]
            acc_ref[0, i, :] += tiles[0][i]

    in_specs = [
        pl.BlockSpec(
            (1, L, block), lambda i, j=j, g=grid: (0, 0, i + j * g), memory_space=pltpu.VMEM
        )
        for j in range(Fin)
    ]
    in_specs.append(pl.BlockSpec((L, f), lambda i: (0, 0), memory_space=pltpu.VMEM))
    o_spec = pl.BlockSpec((1, L, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec(
        (1, L, block), lambda i, rp=rows_per: (i // rp, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, L, out_n), jnp.uint32),
            jax.ShapeDtypeStruct((F_out, L, block), jnp.uint32),
        ),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=(o_spec, acc_spec),
    )(*([stack] * Fin), rs)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _fold_halfsums_pallas(field: Field, n: int, stack, r):
    """Single-factor degree-1 fused round step: fold the (1, L, n) stack
    at challenge r AND accumulate the folded table's half sums (= the
    NEXT round's p(0), p(1) — the structural 0/1 fast path) in the same
    HBM pass.  Returns (folded (1, L, n//2), acc (2, L, block)) where acc
    rows are relaxed uint32 accumulators for _norm_block.

    Accumulation bound: each grid step adds one tile of Montgomery
    values (limbs < 2^16) to one row; <= 2^15 steps per row keeps every
    accumulator lane < 2^31 (the MAX_GRID argument).  Requires n >= 512
    (two 128-lane accumulator blocks per half)."""
    L = field.n_limbs
    out_n = n // 2
    block = min(BLOCK, out_n // 2)
    q = out_n // block  # power of two >= 2
    assert q <= MAX_GRID

    def kernel(left_ref, right_ref, r_ref, o_ref, acc_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        r_rows = [r_ref[i] for i in range(L)]
        out = lm.lerp(
            field,
            [left_ref[0, i] for i in range(L)],
            [right_ref[0, i] for i in range(L)],
            r_rows,
        )
        for i in range(L):
            o_ref[0, i] = out[i]
        in_left = pl.program_id(0) < q // 2

        @pl.when(in_left)
        def _():
            for i in range(L):
                acc_ref[0, i, :] += out[i]

        @pl.when(jnp.logical_not(in_left))
        def _():
            for i in range(L):
                acc_ref[1, i, :] += out[i]

    half = pl.BlockSpec((1, L, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    rhalf = pl.BlockSpec(
        (1, L, block), lambda i, g=q: (0, 0, i + g), memory_space=pltpu.VMEM
    )
    r_spec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec(
        (2, L, block), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, L, out_n), jnp.uint32),
            jax.ShapeDtypeStruct((2, L, block), jnp.uint32),
        ),
        grid=(q,),
        in_specs=[half, rhalf, r_spec],
        out_specs=(half, acc_spec),
    )(stack, stack, r)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _fold_halfsums_small_pallas(field: Field, n: int, stack, r):
    """Small-table variant of _fold_halfsums_pallas (256 <= n < 512):
    one grid step folds the whole (1, L, n) stack and reduces the folded
    halves to (2, L, 1) sums in-kernel via a lane mask (out_n < 256
    can't form two 128-lane accumulator blocks).  Sum bound: out_n <= 256
    summands < 2^16 -> exact uint32."""
    L = field.n_limbs
    out_n = n // 2

    def kernel(left_ref, right_ref, r_ref, o_ref, acc_ref):
        r_rows = [r_ref[i] for i in range(L)]
        out = lm.lerp(
            field,
            [left_ref[0, i] for i in range(L)],
            [right_ref[0, i] for i in range(L)],
            r_rows,
        )
        for i in range(L):
            o_ref[0, i] = out[i]
        mask = (
            jax.lax.broadcasted_iota(jnp.uint32, (1, out_n), 1)
            < out_n // 2
        )
        zero = jnp.zeros((1, out_n), jnp.uint32)
        for i in range(L):
            row = out[i].reshape(1, out_n)
            acc_ref[0, i, 0] = jnp.sum(jnp.where(mask, row, zero))
            acc_ref[1, i, 0] = jnp.sum(jnp.where(mask, zero, row))

    half = pl.BlockSpec((1, L, out_n), lambda: (0, 0, 0), memory_space=pltpu.VMEM)
    rhalf = pl.BlockSpec((1, L, out_n), lambda: (0, 0, 1), memory_space=pltpu.VMEM)
    r_spec = pl.BlockSpec((L, 1), lambda: (0, 0), memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((2, L, 1), lambda: (0, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, L, out_n), jnp.uint32),
            jax.ShapeDtypeStruct((2, L, 1), jnp.uint32),
        ),
        in_specs=[half, rhalf, r_spec],
        out_specs=(half, acc_spec),
    )(stack, stack, r)


@functools.partial(jax.jit, static_argnums=0)
def _half_sums_pallas(field: Field, stack):
    """Degree-1 single-factor round sums of a (1, L, n) stack on TPU:
    p(0) = sum(left half), p(1) = sum(right half), zero multiplies.
    Returns (2, L, block) relaxed uint32 accumulators for _norm_block.
    (The jnp chunk-sum fallback `_half_sums_relaxed` reduces along the
    minor lane axis, which XLA lowers poorly on TPU — this kernel keeps
    the accumulation as full-lane vector adds.)"""
    L = field.n_limbs
    n = stack.shape[-1]
    half = n // 2
    block = min(BLOCK, half)
    q = half // block
    assert q <= MAX_GRID

    def kernel(l_ref, r_ref, acc_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        for i in range(L):
            acc_ref[0, i, :] += l_ref[0, i]
            acc_ref[1, i, :] += r_ref[0, i]

    lhalf = pl.BlockSpec((1, L, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    rhalf = pl.BlockSpec(
        (1, L, block), lambda i, g=q: (0, 0, i + g), memory_space=pltpu.VMEM
    )
    acc_spec = pl.BlockSpec(
        (2, L, block), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2, L, block), jnp.uint32),
        grid=(q,),
        in_specs=[lhalf, rhalf],
        out_specs=acc_spec,
    )(stack, stack)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _fold_then_sums(field: Field, degree: int, k: int, n: int, stack, r):
    """One dispatch per round: fold the (k, L, n) stack at the previous
    challenge, then compute the next round's sums on the folded table.
    Halves the per-round host<->device round-trips (the device_get of the
    sums is the only mandatory Fiat-Shamir sync point).  The degree-1
    single-factor case runs the fused fold+half-sums kernel (one HBM
    pass for the whole round)."""
    if degree == 1 and k == 1 and n >= 512:
        return _fold_halfsums_pallas(field, n, stack, r)
    folded = _fold_pallas(field, k, n, stack, r)
    if degree == 1 and k == 1:
        raw = _half_sums_relaxed(field, folded)
    else:
        raw = _round_sums_pallas(field, degree, k, n // 2, folded)
    return folded, raw


@functools.partial(jax.jit, static_argnums=0)
def _half_sums_relaxed(field: Field, stack):
    """Degree-1 single-factor round sums: p(0) = sum(left half), p(1) =
    sum(right half) — no field multiplications at all (the structural 0/1
    fast path).  Pure XLA: chunked uint32 lane sums (<= 2^10 summands per
    output, so limb accumulators < 2^26).  Returns (2, L, chunks) relaxed
    accumulators for decode_relaxed_sums."""
    x = stack[0]  # (L, n)
    L, n = x.shape
    half = n // 2

    def chunk_sum(a):
        m = a.shape[-1]
        c = max(1, m // (1 << 10))
        return jnp.sum(a.reshape(L, c, m // c), axis=-1, dtype=jnp.uint32)

    return jnp.stack([chunk_sum(x[:, :half]), chunk_sum(x[:, half:])])


def decode_relaxed_sums(field: Field, sums) -> list[int]:
    """(D+1, L, block) relaxed uint32 vector accumulators -> canonical
    ints: exact uint64 lane sums, then bigint carry + Montgomery
    un-scaling + mod p on host.  The accumulated values are sums of
    Montgomery representatives, so the total is (true_sum * R) mod-p
    equivalent; multiply by R^-1 once."""
    a = np.asarray(jax.device_get(sums), dtype=np.uint64)
    lane_tot = a.sum(axis=-1)  # (D+1, L), exact in uint64
    rinv = pow(field.R, -1, field.p)
    out = []
    for row in lane_tot:
        v = 0
        for i, limb in enumerate(row):
            v += int(limb) << (LIMB_BITS * i)
        out.append((v * rinv) % field.p)
    return out


# --------------------------------------------------------------------------
# device-transcript tier: normalized relaxed sums + fused Fiat-Shamir round
# --------------------------------------------------------------------------
#
# To keep the whole prover an async dispatch chain (no per-round host
# sync), every sums kernel is normalized to ONE shape — (D+1, L+1) uint32
# relaxed limbs whose value is the raw sum of Montgomery representatives —
# so the transcript graph (_transcript_round) compiles once per
# (field, degree, terms, pos), not once per table size.

_PALLAS_MIN = 2048  # below this, jnp graphs beat tiny pallas launches

_SUPER_F = 4  # variables per super-round (block-sum Fiat-Shamir phase)
_SUPER_MIN_OUT = 128  # smallest fold-pass output tile (one lane row)


def _norm_block(raw):
    """(D+1, L, block) relaxed accumulators (< 2^31) -> (D+1, L+1).

    lo/hi split keeps every uint32 sum exact: lo < 2^16 summed over
    <= 1024 lanes < 2^26; hi < 2^15 -> < 2^25.  hi carries weight 2^16,
    i.e. limb position +1."""
    lo = jnp.sum(raw & _MASK, axis=-1, dtype=U32)  # (D+1, L)
    hi = jnp.sum(raw >> _B, axis=-1, dtype=U32)
    D1, L = lo.shape
    return jnp.zeros((D1, L + 1), U32).at[:, :L].add(lo).at[:, 1:].add(hi)


def _norm_chunks(raw):
    """(2, L, c) chunk sums (< 2^26) -> (2, L+1).  lo < 2^16 over c <= 2^15
    chunks < 2^31; hi < 2^10 -> < 2^25.  Bounds tables to n <= 2^26/chip
    (matches MAX_GRID's reach)."""
    assert raw.shape[-1] <= 1 << 15
    lo = jnp.sum(raw & _MASK, axis=-1, dtype=U32)
    hi = jnp.sum(raw >> _B, axis=-1, dtype=U32)
    D1, L = lo.shape
    return jnp.zeros((D1, L + 1), U32).at[:, :L].add(lo).at[:, 1:].add(hi)


def _sums_jnp_stack(field: Field, degree: int, stack):
    """XLA (non-pallas) round sums on a (k, L, n) stack -> (D+1, L)
    proper Montgomery sums (same math as zk_tpu.sumcheck._round_sums_kernel)."""
    k, L, n = stack.shape
    half = n // 2
    facs = [stack[t] for t in range(k)]
    out = []
    for i in range(degree + 1):
        if i >= 2:
            r_i = jnp.asarray(dev.const_limbs(field, i)).reshape(L, 1)
        prod = None
        for fac in facs:
            left, right = fac[:, :half], fac[:, half:]
            if i == 0:
                ev = left
            elif i == 1:
                ev = right
            else:
                ev = dev.lerp(field, left, right, r_i)
            prod = ev if prod is None else dev.mont_mul(field, prod, ev)
        out.append(dev.sum_mod(field, prod, axis=-1))
    return jnp.stack(out)  # (D+1, L)


def _sums_norm_inner(field: Field, degree: int, k: int, n: int, stack, use_pallas: bool):
    if degree == 1 and k == 1:
        if use_pallas and n >= _PALLAS_MIN:
            return _norm_block(_half_sums_pallas(field, stack))
        return _norm_chunks(_half_sums_relaxed(field, stack))
    if use_pallas and n >= _PALLAS_MIN:
        return _norm_block(_round_sums_pallas(field, degree, k, n, stack))
    mont = _sums_jnp_stack(field, degree, stack)  # (D+1, L) proper
    return jnp.concatenate([mont, jnp.zeros((degree + 1, 1), U32)], axis=1)


def _fold_stack_inner(field: Field, k: int, n: int, stack, r, use_pallas: bool):
    if use_pallas and n >= _PALLAS_MIN:
        return _fold_pallas(field, k, n, stack, r)
    half = n // 2
    return jnp.stack(
        [
            dev.lerp(field, stack[t][:, :half], stack[t][:, half:], r)
            for t in range(k)
        ]
    )


@functools.lru_cache(maxsize=None)
def _limb_weight_consts(field: Field, mont_out: bool = False) -> np.ndarray:
    """(L, L+1): column j = canonical limbs of 2^(16 j) mod p (times R
    when mont_out).  With mont_mul, limb j of a relaxed accumulator
    contributes a_j * 2^(16 j) * R^-1 — summing un-scales the Montgomery
    factor of the accumulated representatives in the same pass
    (mont_out=True keeps that factor, yielding Montgomery-form sums)."""
    L = field.n_limbs
    out = np.zeros((L, L + 1), dtype=np.uint32)
    scale = field.R if mont_out else 1
    for j in range(L + 1):
        out[:, j] = lm.np_limbs((pow(2, LIMB_BITS * j, field.p) * scale) % field.p, L)
    return out


def _canon_sums(field: Field, norm, mont_out: bool = False):
    """(C, L+1) relaxed uint32 limbs (value = sum of Montgomery reps) ->
    (L, C) true sums, canonical (default) or Montgomery (mont_out).  Each
    relaxed limb (< 2^32) becomes a 2-limb field element; one batched
    mont_mul against the 2^(16 j) weights both positions it and divides
    by R.  Requires p > 2^32."""
    assert field.p > (1 << 32)
    C, L1 = norm.shape
    L = field.n_limbs
    a = (
        jnp.zeros((L, C, L1), U32)
        .at[0]
        .set(norm & _MASK)
        .at[1]
        .set(norm >> _B)
    )
    w = jnp.asarray(_limb_weight_consts(field, mont_out))[:, None, :]  # (L, 1, L+1)
    prods = dev.mont_mul(field, a, w)  # (L, C, L+1)
    return dev.sum_mod(field, prods, axis=-1)  # (L, C)


def _transcript_round_impl(field: Field, degree: int, pos: int, lo, hi, buf, norms):
    """The per-round Fiat-Shamir step, entirely on device: canonicalize
    the round-poly sums, absorb their BE bytes, squeeze the challenge
    (prover.rs:59-62 semantics, byte-exact vs the host Transcript).

    Returns (lo, hi, buf, round_sums (L, D+1) canonical, challenge
    canonical (L, 1), challenge Montgomery (L, 1)).  New pos is always 32
    (finalize_reset re-absorbs the digest)."""
    from zk_tpu.transcript import device as tdev

    canons = [_canon_sums(field, nm) for nm in norms]
    total = canons[0]
    for c in canons[1:]:
        total = dev.add_mod(field, total, c)
    data = tdev.serialize_canonical(field, total)
    lo, hi, buf, pos2 = tdev.absorb(lo, hi, buf, pos, data)
    lo, hi, buf, _pos3, digest = tdev.sample_challenge(lo, hi, buf, pos2)
    mont, canon = tdev.challenge_from_digest(field, digest)
    return lo, hi, buf, total, canon, mont


_transcript_round = functools.partial(jax.jit, static_argnums=(0, 1, 2))(
    _transcript_round_impl
)


def _mini_round(field: Field, pos: int, lo, hi, buf, bs):
    """One degree-1 Fiat-Shamir round computed from Montgomery BLOCK sums
    instead of the table: p(0)/p(1) are the sums of the first/second half
    of bs (L, m), the challenge is squeezed, and bs folds to (L, m/2) —
    exactly the values a table-level round would produce, because modular
    sums commute with the (linear) fold.  Tiny-tensor work only; the
    table itself is untouched (see _prove_chain's super-round phase).

    Returns (lo, hi, buf, total (L, 2) canonical, challenge canonical
    (L, 1), challenge Montgomery (L, 1), folded bs)."""
    from zk_tpu.transcript import device as tdev

    m = bs.shape[-1]
    left, right = bs[:, : m // 2], bs[:, m // 2 :]
    p0 = dev.sum_mod(field, left, -1)[:, None] if m > 2 else left
    p1 = dev.sum_mod(field, right, -1)[:, None] if m > 2 else right
    total = dev.from_mont(field, jnp.concatenate([p0, p1], axis=-1))  # (L, 2)
    data = tdev.serialize_canonical(field, total)
    lo, hi, buf, pos2 = tdev.absorb(lo, hi, buf, pos, data)
    lo, hi, buf, _pos3, digest = tdev.sample_challenge(lo, hi, buf, pos2)
    ch_mont, ch_canon = tdev.challenge_from_digest(field, digest)
    bs2 = dev.lerp(field, left, right, ch_mont) if m > 1 else bs
    return lo, hi, buf, total, ch_canon, ch_mont, bs2


@functools.partial(
    jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6, 7), donate_argnums=(8,)
)
def _prove_chain(
    field: Field,
    degree: int,
    ks: tuple,
    n: int,
    rounds: int,
    pos: int,
    fold_last: bool,
    use_pallas: bool,
    stacks: tuple,
    lo,
    hi,
    buf,
):
    """The ENTIRE device portion of the sumcheck prover as ONE compiled
    program: per round (sums -> absorb -> squeeze -> challenge -> fold),
    unrolled over the statically-shrinking table sizes, with the sponge
    state carried through on device (prover.rs:44-68 semantics).

    One program = one dispatch: on the tunneled chip each launch costs
    ~1.5 ms host->device, so the previous 2-dispatches-per-round loop was
    launch-bound (~2n launches); here the single device_get of the result
    is the only traffic.

    stacks: tuple of (k, L, n) factor stacks (one per product term,
    donated).  Returns (per-round sums [(L, D+1) canonical], per-round
    challenges [(L, 1) canonical], lo, hi, buf, final stacks) where the
    final stacks are folded past the last round iff fold_last (the host
    tail continues from them).

    Degree-1 single-factor proofs run SUPER-ROUNDS while the table is
    large: one HBM pass computes 2^f block sums (by leading index bits),
    f Fiat-Shamir rounds then run entirely on those sums (_mini_round —
    sums commute with the linear fold, so the round polys are bit-exact),
    and ONE multi-variable fold pass applies all f challenges while
    emitting the NEXT super-round's block sums.  Table traffic drops from
    ~3n (read+write per single-variable round, geometric) to ~2n total,
    with 4x fewer large kernel launches and the same multiply count."""
    size = n
    sums_all, chs_all = [], []
    p = pos
    r_done = 0
    if degree == 1 and ks == (1,) and use_pallas:
        F = 1 << _SUPER_F
        stack = stacks[0]
        normF = None
        while r_done < rounds:
            f_eff = min(_SUPER_F, rounds - r_done)
            out_n = size >> f_eff
            last = r_done + f_eff == rounds
            # continuation needs F block-sum rows in the fold pass's
            # output grid; a final fold pass only needs one 128-lane tile
            if out_n < _SUPER_MIN_OUT * (1 if last else F):
                break  # remaining rounds: general per-round loop below
            if normF is None:
                normF = _norm_block(_block_sums_pallas(field, F, size, stack))
            bs = _canon_sums(field, normF, mont_out=True)  # (L, F) Montgomery
            ch_monts = []
            for _ in range(f_eff):
                lo, hi, buf, total, ch_canon, ch_mont, bs = _mini_round(
                    field, p, lo, hi, buf, bs
                )
                p = 32
                sums_all.append(total)
                chs_all.append(ch_canon)
                ch_monts.append(ch_mont)
            r_done += f_eff
            rs = jnp.concatenate(ch_monts, axis=-1)  # (L, f_eff)
            if last and not fold_last:
                if f_eff > 1:  # fold all but the final round's variable
                    stack = _fold_multi_pallas(
                        field, 1, size, f_eff - 1, stack, rs[:, : f_eff - 1]
                    )
                    size >>= f_eff - 1
                normF = None
            elif last:
                stack = _fold_multi_pallas(field, 1, size, f_eff, stack, rs)
                size = out_n
                normF = None
            else:
                stack, acc = _fold_multi_sums_pallas(field, size, f_eff, F, stack, rs)
                size = out_n
                normF = _norm_block(acc)
        stacks = (stack,)
        if r_done == rounds:
            return sums_all, chs_all, lo, hi, buf, stacks
        if normF is not None:
            # seed the general loop's first round sums from the block sums
            # (relaxed rows add exactly: each entry < 2^27, F/2 <= 8 terms)
            norms = [
                jnp.stack(
                    [
                        jnp.sum(normF[: F // 2], axis=0, dtype=U32),
                        jnp.sum(normF[F // 2 :], axis=0, dtype=U32),
                    ]
                )
            ]
        else:
            norms = [
                _sums_norm_inner(field, degree, 1, size, stack, use_pallas)
            ]
    else:
        norms = [
            _sums_norm_inner(field, degree, k, size, s, use_pallas)
            for k, s in zip(ks, stacks)
        ]
    for rnd in range(r_done, rounds):
        lo, hi, buf, total, ch_canon, ch_mont = _transcript_round_impl(
            field, degree, p, lo, hi, buf, tuple(norms)
        )
        p = 32
        sums_all.append(total)
        chs_all.append(ch_canon)
        last = rnd == rounds - 1
        if not last and degree == 1 and ks == (1,) and use_pallas and size >= 256:
            # fused round: fold + next half-sums in ONE HBM pass
            if size >= 512:
                folded, acc = _fold_halfsums_pallas(field, size, stacks[0], ch_mont)
            else:
                folded, acc = _fold_halfsums_small_pallas(
                    field, size, stacks[0], ch_mont
                )
            stacks = (folded,)
            size //= 2
            norms = [_norm_block(acc)]
            continue
        if not last or fold_last:
            stacks = tuple(
                _fold_stack_inner(field, k, size, s, ch_mont, use_pallas)
                for k, s in zip(ks, stacks)
            )
            size //= 2
        if not last:
            norms = [
                _sums_norm_inner(field, degree, k, size, s, use_pallas)
                for k, s in zip(ks, stacks)
            ]
    return sums_all, chs_all, lo, hi, buf, stacks


# --------------------------------------------------------------------------
# host-int tier (exact tail + differential oracle)
# --------------------------------------------------------------------------


class HostTables:
    """Factor tables as Python int lists: terms -> factors -> evals."""

    def __init__(self, field: Field, terms: list[list[list[int]]]):
        self.field = field
        self.terms = terms

    @property
    def size(self) -> int:
        return len(self.terms[0][0])

    def round_sums(self, degree: int) -> list[int]:
        f = self.field
        n = self.size
        half = n // 2
        sums = []
        for point in range(degree + 1):
            total = 0
            for term in self.terms:
                for e in range(half):
                    prod = 1
                    for fac in term:
                        left, right = fac[e], fac[e + half]
                        if point == 0:
                            ev = left
                        elif point == 1:
                            ev = right
                        else:
                            ev = (left - point * (left - right)) % f.p
                        prod = (prod * ev) % f.p
                    total = (total + prod) % f.p
            sums.append(total)
        return sums

    def fold(self, r: int) -> "HostTables":
        f = self.field
        half = self.size // 2
        new_terms = []
        for term in self.terms:
            new_terms.append(
                [
                    [
                        (fac[e] - r * (fac[e] - fac[e + half])) % f.p
                        for e in range(half)
                    ]
                    for fac in term
                ]
            )
        return HostTables(f, new_terms)
