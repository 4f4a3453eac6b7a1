"""Non-interactive sumcheck via Fiat-Shamir — prover and verifier.

Mirrors sumcheck/src/{lib,prover,verifier}.rs with the round math fused
into jitted device kernels:

Per round the reference does D+1 speculative folds + prod_reduce + sum,
then a real fold at the sampled challenge (prover.rs:44-68).  Here a
single jitted graph per table size computes all D+1 round-poly values
(the i=0/1 points are the free half-table sums — no multiplies, the
structural version of the reference's 0/1 fast path at
evaluation_form.rs:60-63), and a second jitted graph folds every factor
table at the challenge.  The Fiat-Shamir transcript runs on host between
rounds (the device->host sync per round is inherent to Fiat-Shamir).

Error semantics match the reference exactly: a failed round check is an
error (verifier.rs:61-66 -> SumcheckError), a failed final oracle check
returns False (verifier.rs:28-32).

Sharded multi-chip proving lives in zk_tpu.parallel; it reuses these
transcript/proof types and replaces the round kernels with shard_map
versions whose element sums end in a psum.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from zk_tpu.fields import device as dev
from zk_tpu.fields.field import Field
from zk_tpu.poly.product import ProductPoly, SumOfProducts
from zk_tpu.poly.univariate import UnivariatePolynomial
from zk_tpu.transcript import Transcript


class SumcheckError(Exception):
    """Raised where the reference returns Err(&'static str)."""


@dataclass
class SumcheckProof:
    """sumcheck/src/lib.rs:8-11."""

    sum: int
    round_polys: list[list[int]]


@dataclass
class SubClaim:
    """sumcheck/src/lib.rs:13-20: all info for the deferred oracle check
    sum == initial_poly(challenges)."""

    sum: int
    challenges: list[int]


# --------------------------------------------------------------------------
# fused device round kernels
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 1))
def _round_sums_kernel(field: Field, degree: int, tables):
    """Round-poly evaluations at 0..=degree in one fused graph.

    tables: tuple (per product term) of tuples (per factor) of (L, N)
    Montgomery limb arrays.  Returns (degree+1, L) canonical... Montgomery
    sums.  Point i=0 takes left halves, i=1 right halves (no multiplies);
    i>=2 lerps with the constant scalar i (prover.rs:49-56 semantics).
    """
    sums = []
    for i in range(degree + 1):
        total = None
        if i >= 2:
            r_i = jnp.asarray(dev.const_limbs(field, i)).reshape(field.n_limbs, 1)
        for term in tables:
            prod = None
            for fac in term:
                n = fac.shape[-1]
                left, right = fac[:, : n // 2], fac[:, n // 2 :]
                if i == 0:
                    ev = left
                elif i == 1:
                    ev = right
                else:
                    ev = dev.lerp(field, left, right, r_i)
                prod = ev if prod is None else dev.mont_mul(field, prod, ev)
            total = prod if total is None else dev.add_mod(field, total, prod)
        sums.append(dev.sum_mod(field, total, axis=-1))
    return jnp.stack(sums)


@functools.partial(jax.jit, static_argnums=0)
def _fold_kernel(field: Field, tables, r):
    """Fold every factor table at challenge r (the real fold of
    prover.rs:64): left - r*(left-right) on the MSB-variable halves."""
    out = []
    for term in tables:
        new_term = []
        for fac in term:
            n = fac.shape[-1]
            new_term.append(dev.lerp(field, fac[:, : n // 2], fac[:, n // 2 :], r))
        out.append(tuple(new_term))
    return tuple(out)


def _poly_to_tables(poly) -> tuple:
    """ProductPoly / SumOfProducts -> tuple-of-tuples of (L, N) tables."""
    if isinstance(poly, SumOfProducts):
        return tuple(tuple(p.data for p in t.polynomials) for t in poly.terms)
    return (tuple(p.data for p in poly.polynomials),)


_ABSORB_CHUNK = 1 << 20  # elements per transcript-absorb fetch


def absorb_poly(transcript: Transcript, poly) -> None:
    """Absorb a polynomial's canonical bytes (prover.rs:17 / the
    verifier's poly binding) without materializing the whole O(2^n)
    byte string: each factor table streams through decode_bytes_be in
    2^20-element chunks (canonical BE bytes are concatenations of
    per-element encodings, so chunked absorption is byte-identical).
    Bounded host memory; throughput is capped by the device->host link
    + the C Keccak backend (~120 MB/s)."""
    for term in _poly_to_tables(poly):
        for fac in term:
            n = fac.shape[-1]
            if n <= _ABSORB_CHUNK:
                transcript.append(dev.decode_bytes_be(poly.field, fac))
                continue
            for a in range(0, n, _ABSORB_CHUNK):
                transcript.append(
                    dev.decode_bytes_be(poly.field, fac[:, a : a + _ABSORB_CHUNK])
                )


# --------------------------------------------------------------------------
# prover
# --------------------------------------------------------------------------


class SumcheckProver:
    """sumcheck/src/prover.rs:9-69.  max_var_degree plays the role of the
    reference's MAX_VAR_DEGREE const generic (number of round-poly sample
    points minus one); defaults to the polynomial's factor-count bound.

    Execution tiers per round (zk_tpu.sumcheck.kernels): fused Pallas
    kernels on TPU for large tables, fused jnp graphs as fallback, exact
    host ints for the tail (tables <= tail_size) — same transcript bytes
    from every tier.
    """

    @staticmethod
    def prove(
        poly,
        sum: int,
        max_var_degree: int | None = None,
        tail_size: int | None = None,
        device_transcript: bool | None = None,
    ) -> SumcheckProof:
        """Prove, binding the initial poly bytes into the transcript
        (prover.rs:15-20)."""
        transcript = Transcript()
        absorb_poly(transcript, poly)
        proof, _ = SumcheckProver._prove_internal(
            poly, sum, transcript, max_var_degree, tail_size, device_transcript
        )
        return proof

    @staticmethod
    def prove_partial(
        poly,
        sum: int,
        max_var_degree: int | None = None,
        tail_size: int | None = None,
        device_transcript: bool | None = None,
    ) -> tuple[SumcheckProof, list[int]]:
        """Prove without binding the initial poly — the GKR hook
        (prover.rs:24-30); returns (proof, challenges)."""
        transcript = Transcript()
        return SumcheckProver._prove_internal(
            poly, sum, transcript, max_var_degree, tail_size, device_transcript
        )

    @staticmethod
    def _prove_internal(
        poly,
        sum: int,
        transcript: Transcript,
        max_var_degree: int | None = None,
        tail_size: int | None = None,
        device_transcript: bool | None = None,
        bind_sum: bool = True,
    ) -> tuple[SumcheckProof, list[int]]:
        """prover.rs:33-69 round loop across the three execution tiers.

        bind_sum=False skips the claimed-sum transcript binding — used by
        the two-phase (Libra) GKR prover, whose second phase continues a
        sumcheck already bound (the verifier absorbs the sum exactly once
        per 2k-round layer proof, verifier.rs:50)."""
        from zk_tpu.sumcheck import kernels as K
        from zk_tpu.fields.pallas_kernels import on_tpu

        field: Field = poly.field
        degree = max_var_degree if max_var_degree is not None else poly.max_degree
        tail = K.TAIL_SIZE if tail_size is None else tail_size
        if bind_sum:
            transcript.append(field.to_bytes_be(sum))

        round_polys: list[list[int]] = []
        challenges: list[int] = []
        n_vars = poly.n_vars
        size = 1 << n_vars
        use_pallas = on_tpu()
        terms = _poly_to_tables(poly)
        if device_transcript is None:
            # default ON where it pays: the axon-tunneled TPU, where each
            # per-round Fiat-Shamir sync is a network round trip
            device_transcript = use_pallas and field.p > (1 << 32)

        if device_transcript and field.p > (1 << 32) and size > tail and n_vars > 0:
            # -- device-resident Fiat-Shamir: every device round is an
            # ASYNC dispatch (capacity kernels + on-device sponge); ONE
            # device_get at the end pulls every round poly + challenge
            # (and the sponge state for the tail).
            from zk_tpu.sumcheck import capacity as C
            from zk_tpu.transcript import device as tdev

            lanes, pend = transcript.export_state()
            lo, hi, buf = tdev.state_to_device(lanes, pend)[:3]
            pos = len(pend)
            stacks = [jnp.stack(term) for term in terms]
            ks = tuple(s.shape[0] for s in stacks)
            # On TPU every round runs on device: the sub-capacity tail is
            # ONE fused dispatch (capacity._tail_fused_fn), cheaper than
            # the host tail's table-decode sync (~26 ms tunnel RTT).  On
            # the CPU tiers the last sub-128 rounds stay on host (device
            # rounds there are hundreds of tiny XLA ops vs ~250 host
            # bigint mults).  An explicit tail_size always wins
            # (tier-differential tests).
            chain_tail = (
                (1 if use_pallas else min(128, tail)) if tail_size is None else tail
            )
            rounds, s_sz = 0, size
            while s_sz > chain_tail and rounds < n_vars:
                rounds += 1
                s_sz //= 2
            fold_last = rounds < n_vars  # host tail continues from stacks
            sums_dev, chall_dev, _ch_m, lo, hi, buf, stacks, _dev_size = C.run_device_rounds(
                field,
                degree,
                ks,
                stacks,
                rounds,
                pos,
                fold_last,
                lo,
                hi,
                buf,
                use_pallas,
            )
            pos = 32
            size = s_sz  # == _dev_size whenever the host tail runs

            # single sync point: round data + sponge state back to host.
            # The state import keeps the caller's Transcript current even
            # when every round ran on device — GKR chains more appends
            # onto it — and costs nothing extra (same device_get).
            got_sums, got_chs, lo_h, hi_h, buf_h = jax.device_get(
                (sums_dev, chall_dev, lo, hi, buf)
            )
            for total, ch in zip(got_sums, got_chs):
                round_polys.append(dev.decode_ints(field, total, mont=False))
                challenges.append(dev.decode_ints(field, ch, mont=False)[0])
            lanes = [int(lo_h[i]) | (int(hi_h[i]) << 32) for i in range(25)]
            pend = bytes(int(x) & 0xFF for x in buf_h[:pos])
            transcript.import_state(lanes, pend)
            if len(challenges) < n_vars:
                host_tables = K.HostTables(
                    field,
                    [
                        [
                            dev.decode_ints(field, stack[t_i])
                            for t_i in range(stack.shape[0])
                        ]
                        for stack in stacks
                    ],
                )
            else:
                return SumcheckProof(sum=sum, round_polys=round_polys), challenges
        elif use_pallas and size > tail:
            # per-round-synced device tier (device_transcript=False): the
            # sums device_get + host Keccak per round are the sync points.
            # Differential tier for the device-resident sponge above.
            from zk_tpu.sumcheck import capacity as C

            stacks = [jnp.stack(term) for term in terms]
            ks = tuple(s.shape[0] for s in stacks)
            cap = size

            def decode_round(raws):
                totals = [0] * (degree + 1)
                for raw in raws:
                    part = K.decode_relaxed_sums(field, raw)
                    totals = [field.add(a, b) for a, b in zip(totals, part)]
                return totals

            while size >= C.CAP_MIN and size > tail and len(challenges) < n_vars:
                raws = [
                    C._round_sums_cap(field, degree, k, cap, size, s)
                    for k, s in zip(ks, stacks)
                ]
                round_poly = decode_round(raws)
                transcript.append(field.elements_to_bytes(round_poly))
                challenge = transcript.sample_field_element(field)
                r = jnp.asarray(dev.const_limbs(field, challenge)).reshape(
                    field.n_limbs, 1
                )
                stacks = [
                    C._fold_cap(field, k, cap, size, s, r)
                    for k, s in zip(ks, stacks)
                ]
                round_polys.append(round_poly)
                challenges.append(challenge)
                size //= 2

            host_tables = K.HostTables(
                field,
                [
                    [
                        dev.decode_ints(field, stack[t_i][:, :size])
                        for t_i in range(stack.shape[0])
                    ]
                    for stack in stacks
                ],
            )
        else:
            host_tables = None

        for _ in range(n_vars - len(challenges)):
            if host_tables is None and size <= tail:
                host_tables = K.HostTables(
                    field,
                    [
                        [dev.decode_ints(field, fac) for fac in term]
                        for term in terms
                    ],
                )

            if host_tables is not None:
                round_poly = host_tables.round_sums(degree)
            else:
                sums = _round_sums_kernel(field, degree, terms)  # (D+1, L)
                round_poly = dev.decode_ints(field, sums.T)

            transcript.append(field.elements_to_bytes(round_poly))
            challenge = transcript.sample_field_element(field)

            if host_tables is not None:
                host_tables = host_tables.fold(challenge)
            else:
                r = jnp.asarray(dev.const_limbs(field, challenge)).reshape(
                    field.n_limbs, 1
                )
                terms = _fold_kernel(field, terms, r)

            round_polys.append(round_poly)
            challenges.append(challenge)
            size //= 2

        return SumcheckProof(sum=sum, round_polys=round_polys), challenges


# --------------------------------------------------------------------------
# verifier
# --------------------------------------------------------------------------


def proof_to_bytes(field: Field, proof: SumcheckProof) -> bytes:
    """Canonical proof serialization (the reference derives
    CanonicalSerialize on its types; layout here: u32 round count, sum,
    then per round u32 eval count + canonical BE elements)."""
    out = bytearray()
    out += len(proof.round_polys).to_bytes(4, "big")
    out += field.to_bytes_be(proof.sum)
    for rp in proof.round_polys:
        out += len(rp).to_bytes(4, "big")
        out += field.elements_to_bytes(rp)
    return bytes(out)


def proof_from_bytes(field: Field, data: bytes) -> SumcheckProof:
    off = 0
    n_rounds = int.from_bytes(data[off : off + 4], "big")
    off += 4
    s = field.from_be_bytes_mod_order(data[off : off + field.n_bytes])
    off += field.n_bytes
    round_polys = []
    for _ in range(n_rounds):
        cnt = int.from_bytes(data[off : off + 4], "big")
        off += 4
        rp = []
        for _ in range(cnt):
            rp.append(field.from_be_bytes_mod_order(data[off : off + field.n_bytes]))
            off += field.n_bytes
        round_polys.append(rp)
    if off != len(data):
        raise ValueError("trailing bytes in serialized proof")
    return SumcheckProof(sum=s, round_polys=round_polys)


class SumcheckVerifier:
    """sumcheck/src/verifier.rs:9-79.  Interpolation and round checks are
    exact host-int math (tiny, O(n d^3))."""

    @staticmethod
    def verify(poly, proof: SumcheckProof) -> bool:
        """Full verification incl. the final oracle check
        (verifier.rs:15-33).  Raises SumcheckError on a failed round
        check; returns False on a failed oracle check."""
        if len(proof.round_polys) != poly.n_vars:
            raise SumcheckError(
                "invalid proof: require 1 round poly for each variable in poly"
            )
        transcript = Transcript()
        absorb_poly(transcript, poly)
        subclaim = SumcheckVerifier._verify_internal(poly.field, proof, transcript)
        initial_poly_eval = poly.evaluate(subclaim.challenges)
        return initial_poly_eval == subclaim.sum

    @staticmethod
    def verify_partial(field: Field, proof: SumcheckProof) -> SubClaim:
        """All checks except the oracle check; returns the SubClaim
        (verifier.rs:38-41)."""
        transcript = Transcript()
        return SumcheckVerifier._verify_internal(field, proof, transcript)

    @staticmethod
    def _verify_internal(
        field: Field, proof: SumcheckProof, transcript: Transcript
    ) -> SubClaim:
        """verifier.rs:44-78."""
        challenges: list[int] = []
        transcript.append(field.to_bytes_be(proof.sum))
        claimed_sum = proof.sum % field.p

        for round_poly in proof.round_polys:
            transcript.append(field.elements_to_bytes(round_poly))
            uni = UnivariatePolynomial.interpolate(field, round_poly)
            p_0 = uni.evaluate(0)
            p_1 = uni.evaluate(1)
            if claimed_sum != field.add(p_0, p_1):
                raise SumcheckError(
                    "verifier check failed: claimed_sum != p(0) + p(1)"
                )
            challenge = transcript.sample_field_element(field)
            claimed_sum = uni.evaluate(challenge)
            challenges.append(challenge)

        return SubClaim(sum=claimed_sum, challenges=challenges)
