"""jnp round kernels, device-transcript round step, and host-int tail
for the sumcheck prover.

Three execution tiers, picked per round by table size and backend:

  * capacity — large tables on TPU: dynamic-grid in-place Pallas kernels
    (zk_tpu.sumcheck.capacity), one compile per prove size.
  * jnp     — CPU test mesh / fallback / sub-Pallas-size device rounds:
    fused jnp graphs (same math, XLA-fused, exact same bytes).
  * host    — tail rounds on tiny tables (< TAIL_SIZE): exact Python
    ints.  Avoids per-size compiles and per-round dispatch latency for
    the cheap end of the fold (SURVEY.md §7 risk 4).

Cross-grid / cross-chunk sum accumulation stays exact without per-block
modular adds: each contribution is a canonical (< p) Montgomery-reduced
value whose 16-bit limbs are raw-accumulated in uint32 — safe for up to
2^16 terms per lane; the accumulators are then normalized to ONE shape —
(D+1, L+1) relaxed limbs — so the device Fiat-Shamir round graph
(_transcript_round) compiles once per (field, degree, terms, pos), not
once per table size.  The host decode (decode_relaxed_sums) finishes
carries + mod p exactly in uint64/bigint.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from zk_tpu.fields import device as dev
from zk_tpu.fields import limb_math as lm
from zk_tpu.fields.field import Field, LIMB_BITS

U32 = jnp.uint32
_MASK = np.uint32((1 << LIMB_BITS) - 1)
_B = LIMB_BITS

TAIL_SIZE = 2048  # tables at/below this size finish on host ints


# --------------------------------------------------------------------------
# jnp tier (CPU mesh + sub-Pallas-size device rounds)
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=0)
def _half_sums_relaxed(field: Field, stack):
    """Degree-1 single-factor round sums: p(0) = sum(left half), p(1) =
    sum(right half) — no field multiplications at all (the structural 0/1
    fast path of evaluation_form.rs:60-63).  Pure XLA: chunked uint32
    lane sums (<= 2^10 summands per output, so limb accumulators < 2^26).
    Returns (2, L, chunks) relaxed accumulators for decode_relaxed_sums."""
    x = stack[0]  # (L, n)
    L, n = x.shape
    half = n // 2

    def chunk_sum(a):
        m = a.shape[-1]
        c = max(1, m // (1 << 10))
        return jnp.sum(a.reshape(L, c, m // c), axis=-1, dtype=jnp.uint32)

    return jnp.stack([chunk_sum(x[:, :half]), chunk_sum(x[:, half:])])


def _sums_jnp_stack(field: Field, degree: int, stack):
    """XLA round sums on a (k, L, n) stack -> (D+1, L) proper Montgomery
    sums (prover.rs:49-56 semantics: point 0/1 take the half tables, no
    multiplies; points >= 2 lerp with the constant scalar)."""
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


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _sums_norm_inner(field: Field, degree: int, k: int, n: int, stack):
    """Round sums normalized to the (D+1, L+1) relaxed-limb shape the
    device transcript round consumes."""
    if degree == 1 and k == 1:
        return _norm_chunks(_half_sums_relaxed(field, stack))
    mont = _sums_jnp_stack(field, degree, stack)  # (D+1, L) proper
    return jnp.concatenate([mont, jnp.zeros((degree + 1, 1), U32)], axis=1)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _fold_stack_inner(field: Field, k: int, n: int, stack, r):
    """Fold every factor of a (k, L, n) stack at challenge r (the real
    fold of prover.rs:64): left - r*(left-right) on the MSB halves."""
    half = n // 2
    return jnp.stack(
        [
            dev.lerp(field, stack[t][:, :half], stack[t][:, half:], r)
            for t in range(k)
        ]
    )


# --------------------------------------------------------------------------
# masked fixed-capacity jnp tier: ONE compiled graph serves a run of
# sizes.  The per-size jnp graphs above recompile every round (the table
# halves); under the XLA:CPU test backend the accumulated compiles are
# both slow and the trigger of a known compiler segfault (pytest.ini).
# Here the stack keeps a fixed (k, L, cap) shape, ``size`` is a traced
# scalar, and dead lanes are masked out of the sums — the same dynamic-
# size design as the Pallas capacity tier (capacity.py), in plain XLA.
# Callers re-slice the buffer every few rounds (run_device_rounds) so
# compile count is O(log(n)/4) per config instead of O(log n).
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 1))
def _sums_norm_masked(field: Field, degree: int, size, stack):
    """Masked round sums over the live prefix [0, size) of a (k, L, cap)
    stack -> (degree+1, L+1) relaxed norm.  Pairs element i with
    i + size/2 via a dynamic gather; lanes >= size/2 are zeroed before
    accumulation, so the values equal the exact-size kernels'."""
    k, L, cap = stack.shape
    half = size // 2
    iota = jnp.arange(cap, dtype=jnp.int32)
    ridx = jnp.where(iota + half < cap, iota + half, 0)
    mask = (iota < half)[None, :]
    facs = [(stack[t], stack[t][:, ridx]) for t in range(k)]
    zeros = jnp.zeros((L, cap), U32)
    out = []
    for i in range(degree + 1):
        if i >= 2:
            r_i = jnp.asarray(dev.const_limbs(field, i)).reshape(L, 1)
        prod = None
        for left, right in facs:
            if i == 0:
                ev = left
            elif i == 1:
                ev = right
            else:
                ev = dev.lerp(field, left, right, r_i)
            prod = ev if prod is None else dev.mont_mul(field, prod, ev)
        out.append(dev.sum_mod(field, jnp.where(mask, prod, zeros), axis=-1))
    mont = jnp.stack(out)  # (degree+1, L) proper Montgomery sums
    return jnp.concatenate([mont, jnp.zeros((degree + 1, 1), U32)], axis=1)


@functools.partial(jax.jit, static_argnums=0)
def _fold_masked(field: Field, size, stack, r):
    """Masked fold at challenge r over the live prefix of a (k, L, cap)
    stack: positions < size/2 get the lerp, the rest keep their (stale
    but limb-valid) values.  Same result prefix as _fold_stack_inner."""
    k, L, cap = stack.shape
    half = size // 2
    iota = jnp.arange(cap, dtype=jnp.int32)
    ridx = jnp.where(iota + half < cap, iota + half, 0)
    mask = (iota < half)[None, :]
    return jnp.stack(
        [
            jnp.where(mask, dev.lerp(field, stack[t], stack[t][:, ridx], r), stack[t])
            for t in range(k)
        ]
    )


# --------------------------------------------------------------------------
# relaxed-sum normalization + host decode
# --------------------------------------------------------------------------


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
    chunks < 2^31; hi < 2^10 -> < 2^25."""
    assert raw.shape[-1] <= 1 << 15
    lo = jnp.sum(raw & _MASK, axis=-1, dtype=U32)
    hi = jnp.sum(raw >> _B, axis=-1, dtype=U32)
    D1, L = lo.shape
    return jnp.zeros((D1, L + 1), U32).at[:, :L].add(lo).at[:, 1:].add(hi)


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
# device-transcript round: canonicalize sums, absorb, squeeze — on device
# --------------------------------------------------------------------------


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
