"""Capacity-buffer Pallas round kernels: one compile serves every round.

Round 2 compiled a fresh Pallas kernel for every table size the prover
visits (the sizes halve each round), then fused all of them into one
giant XLA program — 250s of cold tracing/compiling for a 2^24 prove.
This tier replaces that with *capacity kernels*:

  * every factor stack lives in a fixed (k, L, cap) buffer; the live
    prefix [0, size) shrinks as rounds fold, with ``size`` passed as a
    scalar-prefetch operand and the inner grid a traced value — ONE
    compiled kernel serves all rounds of a prove, and re-runs of the
    same cap hit the in-process + persistent caches;
  * each kernel passes the table as ONE operand in ``pl.ANY`` memory
    space and streams left/right (or 2^f strided) windows of it with a
    manual ``pltpu.emit_pipeline`` — passing the same buffer as several
    XLA operands (round-2 design) silently materializes full copies,
    which both broke donation and cost ~4x runtime;
  * folds are true in-place updates via ``input_output_aliases``: the
    half-size result overwrites the table prefix (new[e] consumes old[e]
    in its own grid step; old[e+half] is never written; pipelined
    prefetch only touches tiles the step has not written), so a 2^26
    BLS12-381 prove holds ONE 4 GiB table, not two;
  * the degree-1 single-factor round is one fused pass (fold at the
    previous challenge + the folded table's half sums = the next round
    polynomial's p(0)/p(1), zero multiplies — the structural version of
    evaluation_form.rs:60-63's 0/1 fast path);
  * higher degrees/factor counts (GKR's 2-factor degree-2 layer
    polynomials) run fold + sums as two passes — the cross-pair products
    p(t) need new[e] and new[e+half'] together, which a single in-place
    pass cannot produce, and the prover is VPU-compute-bound at L=16 so
    the extra HBM pass is not on the critical path.

Accumulation safety: every sums kernel emits relaxed uint32 vector
accumulators ((D+1, L, BLOCK), see kernels.py) — each grid step adds
canonical Montgomery limbs (< 2^16), so up to 2^15 steps stay < 2^31.
The inner grid is largest on the first round: size/2/BLOCK <= 2^15
bounds single-chip tables at 2^26 elements (enforced with an explicit
error that routes larger tables to the sharded prover).

Orchestration: the whole prover is a host Python loop of ASYNC
dispatches (enqueue ~30us on the axon tunnel; a device->host readback
costs ~26ms RTT) — the single device_get at the end is the only sync,
exactly as the Fiat-Shamir structure requires (prover.rs:44-68).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zk_tpu.fields import limb_math as lm
from zk_tpu.fields.field import Field

BLOCK = 1024
CAP_MIN = 4 * BLOCK  # smallest table the capacity kernels accept
MAX_SINGLE_CHIP = 1 << 26  # first-round inner grid = size/2/BLOCK <= 2^15


def _rows(ref, t: int, L: int):
    return [ref[t, i] for i in range(L)]


def _point_consts(field: Field, degree: int):
    """Montgomery limb constants for the sample points 0..degree."""
    return [
        lm.np_limbs((i * field.R) % field.p, field.n_limbs)
        for i in range(degree + 1)
    ]


def _accumulate_points(field, degree, k, lefts, rights, acc_ref, consts):
    """Add this tile's contribution to all D+1 round-poly accumulators.

    Point 0 takes left halves, point 1 right halves (no multiplies);
    points >= 2 lerp with the constant scalar i (prover.rs:49-56)."""
    L = field.n_limbs
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
            acc_ref[point, i, :] += prod[i]


def _scalar(size):
    return jnp.asarray(size, jnp.int32).reshape(1)


def _halves_specs(k: int, L: int):
    """emit_pipeline in_specs for the left/right halves of the live
    prefix; the closures read the dynamic half-tile count."""

    def make(half_tiles):
        return [
            pl.BlockSpec((k, L, BLOCK), lambda i: (0, 0, i)),
            pl.BlockSpec((k, L, BLOCK), lambda i: (0, 0, i + half_tiles)),
        ]

    return make


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _round_sums_cap(field: Field, degree: int, k: int, cap: int, size, stack):
    """All D+1 round-poly sums over the live prefix [0, size) of a
    (k, L, cap) stack -> (D+1, L, BLOCK) relaxed uint32 accumulators."""
    L = field.n_limbs
    consts = _point_consts(field, degree)

    def outer(s_ref, t_ref, acc_ref):
        half_tiles = s_ref[0] // (2 * BLOCK)
        acc_ref[...] = jnp.zeros_like(acc_ref)

        def inner(l_ref, r_ref):
            lefts = [_rows(l_ref, t, L) for t in range(k)]
            rights = [_rows(r_ref, t, L) for t in range(k)]
            _accumulate_points(field, degree, k, lefts, rights, acc_ref, consts)

        pltpu.emit_pipeline(
            inner,
            grid=(half_tiles,),
            in_specs=_halves_specs(k, L)(half_tiles),
        )(t_ref, t_ref)

    return pl.pallas_call(
        outer,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((degree + 1, L, BLOCK), jnp.uint32),
    )(_scalar(size), stack)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _round_sums_terms_cap(
    field: Field, degree: int, term_ks: tuple, cap: int, size, stack
):
    """Round-poly sums of a SumOfProducts in ONE pass: stack holds every
    term's factors concatenated ((sum(term_ks), L, cap)); each grid step
    accumulates sum_t prod_{factors of t} directly — the transcript only
    ever consumes the summed round polynomial, so fusing the terms saves
    one kernel launch per term per round (GKR's phase polynomials are
    2-term).  Accumulator bound: each step adds len(term_ks) canonical
    values per lane, so the caller caps size at 2^26/len(term_ks)."""
    L = field.n_limbs
    consts = _point_consts(field, degree)

    def outer(s_ref, t_ref, acc_ref):
        half_tiles = s_ref[0] // (2 * BLOCK)
        acc_ref[...] = jnp.zeros_like(acc_ref)

        def inner(l_ref, r_ref):
            for point in range(degree + 1):
                row = 0
                for k in term_ks:
                    prod = None
                    for _ in range(k):
                        if point == 0:
                            ev = [l_ref[row, i] for i in range(L)]
                        elif point == 1:
                            ev = [r_ref[row, i] for i in range(L)]
                        else:
                            ev = lm.lerp(
                                field,
                                [l_ref[row, i] for i in range(L)],
                                [r_ref[row, i] for i in range(L)],
                                consts[point],
                            )
                        prod = ev if prod is None else lm.mont_mul(field, prod, ev)
                        row += 1
                    for i in range(L):
                        acc_ref[point, i, :] += prod[i]

        K = sum(term_ks)
        pltpu.emit_pipeline(
            inner,
            grid=(half_tiles,),
            in_specs=_halves_specs(K, L)(half_tiles),
        )(t_ref, t_ref)

    return pl.pallas_call(
        outer,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((degree + 1, L, BLOCK), jnp.uint32),
    )(_scalar(size), stack)


@functools.partial(jax.jit, static_argnums=(0, 1, 2), donate_argnums=(4,))
def _fold_cap(field: Field, k: int, cap: int, size, stack, r):
    """In-place fold of the live prefix at challenge r: new[e] =
    lerp(old[e], old[e + size/2]) for e < size/2, written back over the
    prefix (the back half becomes stale; callers track size)."""
    L = field.n_limbs

    def outer(s_ref, r_ref, tin_ref, tout_ref):
        half_tiles = s_ref[0] // (2 * BLOCK)

        def inner(l_ref, rt_ref, o_ref):
            r_rows = [r_ref[i] for i in range(L)]
            for t in range(k):
                out = lm.lerp(
                    field, _rows(l_ref, t, L), _rows(rt_ref, t, L), r_rows
                )
                for i in range(L):
                    o_ref[t, i] = out[i]

        pltpu.emit_pipeline(
            inner,
            grid=(half_tiles,),
            in_specs=_halves_specs(k, L)(half_tiles),
            out_specs=[pl.BlockSpec((k, L, BLOCK), lambda i: (0, 0, i))],
        )(tin_ref, tin_ref, tout_ref)

    return pl.pallas_call(
        outer,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # r
                pl.BlockSpec(memory_space=pl.ANY),  # table
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=jax.ShapeDtypeStruct((k, L, cap), jnp.uint32),
        input_output_aliases={2: 0},
    )(_scalar(size), r, stack)


@functools.partial(jax.jit, static_argnums=(0, 1), donate_argnums=(3,))
def _fold_halfsums_cap(field: Field, cap: int, size, stack, r):
    """Fused degree-1 single-factor round: in-place fold the (1, L, cap)
    prefix at r AND accumulate the folded table's half sums (= the next
    round's p(0)/p(1)) in the same pass.  Returns (folded stack,
    (2, L, BLOCK) relaxed accumulators).  Requires size >= 4*BLOCK so
    each half of the folded table spans >= 1 grid step."""
    L = field.n_limbs

    def outer(s_ref, r_ref, tin_ref, tout_ref, acc_ref):
        half_tiles = s_ref[0] // (2 * BLOCK)
        quarter_tiles = s_ref[0] // (4 * BLOCK)
        acc_ref[...] = jnp.zeros_like(acc_ref)

        def inner(l_ref, rt_ref, o_ref):
            r_rows = [r_ref[i] for i in range(L)]
            out = lm.lerp(field, _rows(l_ref, 0, L), _rows(rt_ref, 0, L), r_rows)
            for i in range(L):
                o_ref[0, i] = out[i]
            in_left = pl.program_id(0) < quarter_tiles

            @pl.when(in_left)
            def _():
                for i in range(L):
                    acc_ref[0, i, :] += out[i]

            @pl.when(jnp.logical_not(in_left))
            def _():
                for i in range(L):
                    acc_ref[1, i, :] += out[i]

        pltpu.emit_pipeline(
            inner,
            grid=(half_tiles,),
            in_specs=_halves_specs(1, L)(half_tiles),
            out_specs=[pl.BlockSpec((1, L, BLOCK), lambda i: (0, 0, i))],
        )(tin_ref, tin_ref, tout_ref)

    return pl.pallas_call(
        outer,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # r
                pl.BlockSpec(memory_space=pl.ANY),  # table
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, L, cap), jnp.uint32),
            jax.ShapeDtypeStruct((2, L, BLOCK), jnp.uint32),
        ),
        input_output_aliases={2: 0},
    )(_scalar(size), r, stack)


@functools.partial(jax.jit, static_argnums=(0, 1, 2), donate_argnums=(4,))
def _fold_multi_cap(field: Field, f: int, cap: int, size, stack, rs):
    """Fold f consecutive MSB variables of a (1, L, cap) prefix in ONE
    in-place pass.  rs: (L, f) Montgomery scalars, column l = fold scalar
    for variable l.  The live prefix shrinks size -> size >> f.

    Each grid step reads 2^f tiles at stride size/2^f and lerp-reduces
    them down a binary tree on registers: same 2^f - 1 multiplies per
    output element as f separate folds, but the table streams from HBM
    once instead of ~2x (geometric).  Tree order matches consecutive
    var-0 folds (evaluation_form.rs:54-72): level l pairs tiles
    j, j + 2^(f-1-l).  Alias safety: step i writes tile i and reads
    tiles i + j*(size>>f)/BLOCK — only j=0 coincides, within the step.
    """
    L = field.n_limbs
    F = 1 << f

    def outer(s_ref, rs_ref, tin_ref, tout_ref):
        out_tiles = s_ref[0] // (F * BLOCK)

        def inner(*refs):
            ins = refs[:F]
            o_ref = refs[F]
            tiles = [[ins[j][0, i] for i in range(L)] for j in range(F)]
            m = F
            for l in range(f):
                r = [rs_ref[i, l : l + 1] for i in range(L)]
                tiles = [
                    lm.lerp(field, tiles[j], tiles[j + m // 2], r)
                    for j in range(m // 2)
                ]
                m //= 2
            for i in range(L):
                o_ref[0, i] = tiles[0][i]

        in_specs = [
            pl.BlockSpec(
                (1, L, BLOCK), lambda i, j=j: (0, 0, i + j * out_tiles)
            )
            for j in range(F)
        ]
        pltpu.emit_pipeline(
            inner,
            grid=(out_tiles,),
            in_specs=in_specs,
            out_specs=[pl.BlockSpec((1, L, BLOCK), lambda i: (0, 0, i))],
        )(*([tin_ref] * F), tout_ref)

    return pl.pallas_call(
        outer,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # rs
                pl.BlockSpec(memory_space=pl.ANY),  # table
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=jax.ShapeDtypeStruct((1, L, cap), jnp.uint32),
        input_output_aliases={2: 0},
    )(_scalar(size), rs, stack)


# --------------------------------------------------------------------------
# device round loop (async host orchestration, one sync at the end)
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _transcript_round_cap(field: Field, degree: int, pos: int, lo, hi, buf, accs):
    """Fiat-Shamir round step fed by raw (D+1, L, BLOCK) capacity-kernel
    accumulators (one per product term): normalize, canonicalize, absorb,
    squeeze — all on device (kernels._transcript_round_impl)."""
    from zk_tpu.sumcheck.kernels import _norm_block, _transcript_round_impl

    norms = tuple(_norm_block(a) for a in accs)
    return _transcript_round_impl(field, degree, pos, lo, hi, buf, norms)


@functools.partial(jax.jit, static_argnums=(0, 1, 2), donate_argnums=(4,))
def _deg1_round_cap(field: Field, cap: int, pos: int, size, stack, acc, lo, hi, buf):
    """One dispatch for a steady-state degree-1 single-factor round:
    Fiat-Shamir on the pending half-sum accumulators (produced by the
    PREVIOUS round's fused fold), then the fused in-place fold + next
    half sums at the fresh challenge.  Returns (folded stack, next acc,
    lo, hi, buf, round sums, challenge canonical).

    The challenge's data dependency on the sums orders the transcript
    graph before the aliased fold inside one XLA program; `stack` has a
    single use (the fold), so donation stays clean."""
    lo, hi, buf, total, ch_c, ch_m = _transcript_round_cap.__wrapped__(
        field, 1, pos, lo, hi, buf, (acc,)
    )
    folded, acc2 = _fold_halfsums_cap.__wrapped__(field, cap, size, stack, ch_m)
    return folded, acc2, lo, hi, buf, total, ch_c, ch_m


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4), donate_argnums=(6,))
def _transcript_fold_cap(
    field: Field, degree: int, k: int, cap: int, pos: int, size, stack, accs, lo, hi, buf
):
    """One dispatch for (transcript round + in-place fold) of a general
    (degree, k) round — the sums were computed by a separate kernel on
    the pre-fold table (its accumulators arrive as `accs`), so `stack`
    has a single use here and donation stays clean."""
    lo, hi, buf, total, ch_c, ch_m = _transcript_round_cap.__wrapped__(
        field, degree, pos, lo, hi, buf, accs
    )
    folded = _fold_cap.__wrapped__(field, k, cap, size, stack, ch_m)
    return folded, lo, hi, buf, total, ch_c, ch_m


@functools.partial(
    jax.jit, static_argnums=(0, 1, 2, 3, 4), donate_argnums=(6,)
)
def _fused_round_cap(field: Field, degree: int, ks: tuple, cap: int, pos: int, size, stack, acc, lo, hi, buf):
    """One dispatch for a general (degree, ks) steady-state round:
    Fiat-Shamir on the pending accumulators, in-place fold at the fresh
    challenge, AND the folded table's next-round sums — the general-k
    sibling of _deg1_round_cap (fold and sums stay two HBM passes; the
    dispatch is what the axon tunnel charges ~3-5 ms for, so fusing
    halves the chain's drain time).  Only valid when the folded size
    still meets the capacity-kernel floor (size//2 >= CAP_MIN)."""
    lo, hi, buf, total, ch_c, ch_m = _transcript_round_cap.__wrapped__(
        field, degree, pos, lo, hi, buf, (acc,)
    )
    K_tot = sum(ks)
    folded = _fold_cap.__wrapped__(field, K_tot, cap, size, stack, ch_m)
    half = size // 2
    if len(ks) == 1:
        acc2 = _round_sums_cap.__wrapped__(field, degree, ks[0], cap, half, folded)
    else:
        acc2 = _round_sums_terms_cap.__wrapped__(field, degree, ks, cap, half, folded)
    return folded, acc2, lo, hi, buf, total, ch_c, ch_m


@functools.lru_cache(maxsize=None)
def _tail_fused_fn(
    field: Field, degree: int, ks: tuple, entry: int, rounds: int, pos: int, fold_last: bool
):
    """ONE jitted program for every device round below the capacity
    floor: `rounds` unrolled exact-size rounds (sums -> absorb ->
    squeeze -> fold) from table size `entry` down.  The whole-loop
    unroll that was abandoned for LARGE tables (round-2's 250 s cold
    compiles) is exactly right here — shapes are <= CAP_MIN, the graphs
    are tiny, and it turns ~2*rounds tunnel dispatches into one."""
    from zk_tpu.sumcheck import kernels as K

    @jax.jit
    def run(stacks, lo, hi, buf):
        size = entry
        sums, chc, chm = [], [], []
        p = pos
        for rnd in range(rounds):
            last = rnd == rounds - 1
            will_fold = (not last) or fold_last
            norms = tuple(
                K._sums_norm_inner.__wrapped__(field, degree, k, size, s)
                for k, s in zip(ks, stacks)
            )
            lo, hi, buf, total, ch_c, ch_m = K._transcript_round_impl(
                field, degree, p, lo, hi, buf, norms
            )
            if will_fold:
                stacks = tuple(
                    K._fold_stack_inner.__wrapped__(field, k, size, s, ch_m)
                    for k, s in zip(ks, stacks)
                )
                size //= 2
            p = 32
            sums.append(total)
            chc.append(ch_c)
            chm.append(ch_m)
        return sums, chc, chm, lo, hi, buf, stacks

    return run


def run_device_rounds(
    field: Field,
    degree: int,
    ks: tuple,
    stacks: list,
    rounds: int,
    pos: int,
    fold_last: bool,
    lo,
    hi,
    buf,
    use_pallas: bool,
):
    """All device-resident prover rounds as an async dispatch chain
    (prover.rs:44-68 semantics): per round, sums -> absorb -> squeeze ->
    challenge -> fold, with the sponge state carried on device.  Nothing
    here blocks; the caller performs the single device_get.

    stacks: list of freshly-materialized (k, L, size) factor stacks (one
    per product term) — they are donated to the in-place fold kernels.
    Returns (per-round sums [(L, D+1) canonical], per-round challenges
    [(L, 1) canonical], per-round challenges [(L, 1) Montgomery — for
    device consumers like the GKR layer chain], lo, hi, buf, final
    stacks (live prefix only), final size).  The final stacks are folded
    past the last round iff fold_last (the host tail continues from
    them).

    Tiers: capacity Pallas kernels while size >= CAP_MIN on TPU (the
    degree-1 single-factor case fuses fold + next-round half sums into
    one HBM pass), fused jnp graphs below that (byte-identical sums).
    """
    from zk_tpu.sumcheck import kernels as K

    size = stacks[0].shape[-1]
    cap = size
    n_terms = len(ks)
    if use_pallas and size * n_terms > MAX_SINGLE_CHIP:
        raise ValueError(
            f"single-chip capacity kernels support tables up to "
            f"2^26/terms elements (relaxed-accumulator grid bound); got "
            f"{size} x {n_terms} terms. Shard the table over a mesh with "
            f"zk_tpu.parallel.ShardedSumcheckProver."
        )
    deg1 = degree == 1 and ks == (1,)
    in_cap = use_pallas and size >= CAP_MIN
    K_total = sum(ks)
    combined = in_cap and n_terms > 1
    if combined:
        # one (sum(ks), L, cap) stack: one sums kernel + one fold kernel
        # per round regardless of term count (see _round_sums_terms_cap)
        stacks = [jnp.concatenate(stacks, axis=0)]
    sums_all, chs_all, chs_mont = [], [], []
    pending_acc = None  # next-round sums already produced by a fused fold
    p = pos
    for rnd in range(rounds):
        last = rnd == rounds - 1
        will_fold = (not last) or fold_last
        if in_cap:
            # in_cap implies exactly one stack (terms concatenated)
            k_eff = K_total if combined else ks[0]
            if pending_acc is not None:
                acc = pending_acc
                pending_acc = None
            elif combined:
                acc = _round_sums_terms_cap(field, degree, ks, cap, size, stacks[0])
            else:
                acc = _round_sums_cap(field, degree, k_eff, cap, size, stacks[0])
            if not will_fold:
                lo, hi, buf, total, ch_c, ch_m = _transcript_round_cap(
                    field, degree, p, lo, hi, buf, (acc,)
                )
            elif deg1 and not last:
                # ONE dispatch: transcript + fused in-place fold + next sums
                folded, pending_acc, lo, hi, buf, total, ch_c, ch_m = _deg1_round_cap(
                    field, cap, p, size, stacks[0], acc, lo, hi, buf
                )
                stacks = [folded]
                size //= 2
            elif not last and size // 2 >= CAP_MIN:
                # general fused round: transcript + fold + next sums
                folded, pending_acc, lo, hi, buf, total, ch_c, ch_m = _fused_round_cap(
                    field, degree, ks, cap, p, size, stacks[0], acc, lo, hi, buf
                )
                stacks = [folded]
                size //= 2
            else:
                folded, lo, hi, buf, total, ch_c, ch_m = _transcript_fold_cap(
                    field, degree, k_eff, cap, p, size, stacks[0], (acc,), lo, hi, buf
                )
                stacks = [folded]
                size //= 2
            if will_fold and size < CAP_MIN:
                stacks = [s[:, :, :size] for s in stacks]
                in_cap = False
                if combined:
                    stacks = _split_terms(stacks[0], ks)
                    combined = False
        else:
            if use_pallas and pending_acc is None:
                # TPU sub-capacity tail: every remaining round in ONE
                # fused dispatch (_tail_fused_fn); the program's round
                # sizes are exact, so trim any masked-tier buffer slack
                stacks = [
                    s[:, :, :size] if s.shape[-1] > size else s for s in stacks
                ]
                remaining = rounds - rnd
                s_list, c_list, m_list, lo, hi, buf, stacks_t = _tail_fused_fn(
                    field, degree, ks, size, remaining, p, fold_last
                )(tuple(stacks), lo, hi, buf)
                sums_all.extend(s_list)
                chs_all.extend(c_list)
                chs_mont.extend(m_list)
                stacks = list(stacks_t)
                size >>= remaining - (0 if fold_last else 1)
                break
            # masked fixed-capacity jnp tier: one compiled (sums, fold)
            # graph pair serves a run of sizes (kernels.py); the buffer
            # re-slices every 4 halvings to bound the masked overwork
            sz_op = jnp.asarray(size, jnp.int32)
            if pending_acc is not None:
                args = (pending_acc,)
                pending_acc = None
                lo, hi, buf, total, ch_c, ch_m = _transcript_round_cap(
                    field, degree, p, lo, hi, buf, args
                )
            else:
                norms = tuple(
                    K._sums_norm_masked(field, degree, sz_op, s) for s in stacks
                )
                lo, hi, buf, total, ch_c, ch_m = K._transcript_round(
                    field, degree, p, lo, hi, buf, norms
                )
            if will_fold:
                stacks = [K._fold_masked(field, sz_op, s, ch_m) for s in stacks]
                size //= 2
                if size >= 2 and size * 16 <= stacks[0].shape[-1]:
                    stacks = [s[:, :, :size] for s in stacks]
        p = 32
        sums_all.append(total)
        chs_all.append(ch_c)
        chs_mont.append(ch_m)
    if stacks and stacks[0].shape[-1] > size:
        stacks = [s[:, :, :size] for s in stacks]
    if combined:
        stacks = _split_terms(stacks[0], ks)
    return sums_all, chs_all, chs_mont, lo, hi, buf, stacks, size


def _split_terms(stack, ks: tuple) -> list:
    """(sum(ks), L, n) combined stack -> per-term stacks."""
    out, row = [], 0
    for k in ks:
        out.append(stack[row : row + k])
        row += k
    return out
