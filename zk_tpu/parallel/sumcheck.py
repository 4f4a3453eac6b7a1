"""Mesh-sharded sumcheck prover — byte-identical proofs to single-chip.

Layout (SURVEY.md §7 trick, restated): a 2^n table is viewed as
(L, W, S) with flat natural index w*S + s.  The S axis is sharded across
the mesh; the W axis holds the top log2(W) bits = the EARLY variables,
which sumcheck folds first.  Each fold halves W with contiguous local
slices (left = w < W/2, right = w >= W/2) — zero communication; the only
collective is one psum of (degree+1) partial sums per round.  When W
reaches 1 the surviving table (size S = one element per lane) is
gathered and the remaining log2(S) rounds run on host ints (the
gather-to-replicated cheap tail, SURVEY.md §7 risk 4).

The transcript, challenge flow, and emitted bytes are identical to
zk_tpu.sumcheck.SumcheckProver — sharding is invisible to the verifier.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from zk_tpu.fields import device as dev
from zk_tpu.fields.field import Field, LIMB_BITS
from zk_tpu.sumcheck import SumcheckProof, _poly_to_tables
from zk_tpu.sumcheck.kernels import HostTables
from zk_tpu.transcript import Transcript

def _axes(mesh: Mesh) -> tuple:
    """All mesh axis names: the table's lane axis shards over the FULL
    mesh (e.g. ("dcn", "ici") for a multi-host slice — ICI within a
    host-group, DCN across; XLA lowers the psum to a hierarchical
    reduction over both links)."""
    return tuple(mesh.axis_names)


@functools.lru_cache(maxsize=None)
def _sums_fn(field: Field, degree: int, mesh: Mesh):
    """Cached jitted shard_map round-sums kernel for one (field, degree,
    mesh); shapes re-specialize under jit as tables shrink."""

    axes = _axes(mesh)

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P(None, None, None, axes),
        out_specs=P(None, None),
    )
    def one_term(stack):  # local (k, L, W, S/D)
        k = stack.shape[0]
        w = stack.shape[2]
        outs = []
        for point in range(degree + 1):
            prod = None
            for t in range(k):
                fac = stack[t]  # (L, W, Sd)
                left, right = fac[:, : w // 2, :], fac[:, w // 2 :, :]
                if point == 0:
                    ev = left
                elif point == 1:
                    ev = right
                else:
                    r_i = jnp.asarray(dev.const_limbs(field, point)).reshape(
                        field.n_limbs, 1, 1
                    )
                    ev = dev.lerp(field, left, right, r_i)
                prod = ev if prod is None else dev.mont_mul(field, prod, ev)
            flat = prod.reshape(field.n_limbs, -1)
            local = dev.sum_mod(field, flat, axis=-1)  # (L,) canonical < p
            outs.append(jax.lax.psum(local, axes))  # relaxed: < D * 2^16/limb
        return jnp.stack(outs)

    return one_term


def _round_sums_sharded(field: Field, degree: int, mesh: Mesh, terms3):
    """terms3: list of (k, L, W, S) sharded arrays -> (degree+1, L) relaxed
    limb accumulators (values < D * 2^16 per limb; exact host decode)."""
    fn = _sums_fn(field, degree, mesh)
    total = None
    for t3 in terms3:
        part = fn(t3)
        total = part if total is None else total + part  # still relaxed-exact
    return total


@functools.lru_cache(maxsize=None)
def _fold_fn(field: Field, mesh: Mesh):
    axes = _axes(mesh)

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, None, None, axes), P(None, None)),
        out_specs=P(None, None, None, axes),
    )
    def one_term(stack, r_loc):
        k, L, w, sd = stack.shape
        outs = []
        for t in range(k):
            fac = stack[t]
            outs.append(
                dev.lerp(
                    field, fac[:, : w // 2, :], fac[:, w // 2 :, :], r_loc[:, :1, None]
                )
            )
        return jnp.stack(outs)

    return one_term


def _fold_sharded(field: Field, mesh: Mesh, terms3, r):
    """Fold every factor's W axis at challenge r; W halves, S untouched."""
    fn = _fold_fn(field, mesh)
    return [fn(t3, r) for t3 in terms3]


@functools.lru_cache(maxsize=None)
def _chain_fn(
    field: Field,
    degree: int,
    n_terms: int,
    mesh: Mesh,
    w: int,
    rounds: int,
    pos: int,
    fold_last: bool,
):
    """Cached jitted whole-loop prover chain over the mesh: all `rounds`
    device rounds (psum'd sums -> replicated sponge -> sharded fold) as
    ONE compiled program — one dispatch + one device_get for the entire
    sharded phase, mirroring the single-chip kernels._prove_chain."""
    from zk_tpu.sumcheck import kernels as K

    sums_one = _sums_fn(field, degree, mesh)
    fold_one = _fold_fn(field, mesh)

    @jax.jit
    def run(terms3, lo, hi, buf):
        zcol = jnp.zeros((degree + 1, 1), jnp.uint32)
        p = pos
        sums_all, chs_all = [], []
        for rnd in range(rounds):
            total_relaxed = None
            for t3 in terms3:
                part = sums_one(t3)
                total_relaxed = (
                    part if total_relaxed is None else total_relaxed + part
                )
            norm = jnp.concatenate([total_relaxed, zcol], axis=1)
            lo, hi, buf, total, ch_canon, ch_mont = K._transcript_round_impl(
                field, degree, p, lo, hi, buf, (norm,)
            )
            p = 32
            sums_all.append(total)
            chs_all.append(ch_canon)
            if rnd < rounds - 1 or fold_last:
                terms3 = tuple(fold_one(t3, ch_mont) for t3 in terms3)
        return sums_all, chs_all, lo, hi, buf, terms3

    return run


def _decode_relaxed_vec(field: Field, arr) -> list[int]:
    """(D+1, L) relaxed uint32 limb rows (sums of Montgomery values) ->
    canonical ints: bigint carry, then un-scale by R^-1, mod p."""
    a = np.asarray(jax.device_get(arr), dtype=np.uint64)
    rinv = pow(field.R, -1, field.p)
    out = []
    for row in a:
        v = 0
        for i, limb in enumerate(row):
            v += int(limb) << (LIMB_BITS * i)
        out.append((v * rinv) % field.p)
    return out


class ShardedSumcheckProver:
    """Drop-in sharded prover: same proofs, psum-per-round collectives."""

    @staticmethod
    def prove_partial(
        mesh: Mesh,
        poly,
        sum: int,
        max_var_degree: int | None = None,
        device_transcript: bool | None = None,
    ) -> tuple[SumcheckProof, list[int]]:
        transcript = Transcript()
        return ShardedSumcheckProver._prove_internal(
            mesh, poly, sum, transcript, max_var_degree, device_transcript
        )

    @staticmethod
    def prove(
        mesh: Mesh,
        poly,
        sum: int,
        max_var_degree: int | None = None,
        device_transcript: bool | None = None,
    ) -> SumcheckProof:
        from zk_tpu.sumcheck import absorb_poly

        transcript = Transcript()
        absorb_poly(transcript, poly)
        proof, _ = ShardedSumcheckProver._prove_internal(
            mesh, poly, sum, transcript, max_var_degree, device_transcript
        )
        return proof

    @staticmethod
    def _prove_internal(
        mesh: Mesh,
        poly,
        sum: int,
        transcript: Transcript,
        max_var_degree: int | None = None,
        device_transcript: bool | None = None,
        bind_sum: bool = True,
    ) -> tuple[SumcheckProof, list[int]]:
        """bind_sum=False skips the claimed-sum transcript binding — used
        by the two-phase (Libra) GKR prover, whose second phase continues
        a sumcheck already bound (see SumcheckProver._prove_internal)."""
        field: Field = poly.field
        degree = max_var_degree if max_var_degree is not None else poly.max_degree
        if bind_sum:
            transcript.append(field.to_bytes_be(sum))
        if device_transcript is None:
            from zk_tpu.fields.pallas_kernels import on_tpu

            device_transcript = on_tpu() and field.p > (1 << 32)
        device_transcript = device_transcript and field.p > (1 << 32)

        n_vars = poly.n_vars
        n = 1 << n_vars
        d_mesh = mesh.devices.size
        L = field.n_limbs
        if d_mesh & (d_mesh - 1):
            # the sharded lane extent S = d_mesh * c must divide the
            # power-of-two table; TPU slices are power-of-two meshes
            raise ValueError(
                f"sharded sumcheck requires a power-of-two mesh, got {d_mesh}"
            )

        # choose the sharded lane extent S = D * C; keep W >= 2
        c = max(1, min(1024, n // (2 * d_mesh)))
        s_extent = d_mesh * c
        if n < 2 * s_extent:
            s_extent = d_mesh if n >= 2 * d_mesh else 1
        w = n // s_extent

        terms = _poly_to_tables(poly)
        sharding = NamedSharding(mesh, P(None, None, None, _axes(mesh)))
        terms3 = [
            jax.device_put(
                jnp.stack([f.reshape(L, w, s_extent) for f in term]), sharding
            )
            for term in terms
        ]

        round_polys: list[list[int]] = []
        challenges: list[int] = []

        if device_transcript:
            # device-resident Fiat-Shamir over the mesh: the psum'd
            # (replicated) relaxed sums feed the on-device sponge, the
            # challenge feeds the sharded fold — no per-round host sync;
            # one device_get at the end (same pattern as the single-chip
            # tier in zk_tpu.sumcheck).
            from zk_tpu.sumcheck import kernels as K
            from zk_tpu.transcript import device as tdev

            rep = NamedSharding(mesh, P())
            lanes, pend = transcript.export_state()
            lo, hi, buf, pos = tdev.state_to_device(lanes, pend)
            lo, hi, buf = (jax.device_put(a, rep) for a in (lo, hi, buf))
            rounds, w_sz = 0, w
            while w_sz > 1 and rounds < n_vars:
                rounds += 1
                w_sz //= 2
            fold_last = rounds < n_vars  # host tail continues from terms3
            sums_dev, chall_dev = [], []
            if rounds:
                run = _chain_fn(
                    field, degree, len(terms3), mesh, w, rounds, pos, fold_last
                )
                sums_dev, chall_dev, lo, hi, buf, terms3 = run(
                    tuple(terms3), lo, hi, buf
                )
                pos = 32
                w = w_sz
            # single sync point; also restores the host transcript sponge
            # (keeps chained protocols correct — same as the single-chip tier)
            got_sums, got_chs, lo_h, hi_h, buf_h = jax.device_get(
                (sums_dev, chall_dev, lo, hi, buf)
            )
            for total, ch in zip(got_sums, got_chs):
                round_polys.append(dev.decode_ints(field, total, mont=False))
                challenges.append(dev.decode_ints(field, ch, mont=False)[0])
            lanes = [int(lo_h[i]) | (int(hi_h[i]) << 32) for i in range(25)]
            pend = bytes(int(x) & 0xFF for x in buf_h[:pos])
            transcript.import_state(lanes, pend)
        else:
            for _ in range(n_vars):
                if w <= 1:
                    break
                relaxed = _round_sums_sharded(field, degree, mesh, terms3)
                round_poly = _decode_relaxed_vec(field, relaxed)
                transcript.append(field.elements_to_bytes(round_poly))
                challenge = transcript.sample_field_element(field)
                r = jnp.asarray(dev.const_limbs(field, challenge)).reshape(L, 1)
                terms3 = _fold_sharded(field, mesh, terms3, r)
                round_polys.append(round_poly)
                challenges.append(challenge)
                w //= 2

        # gather-to-host tail for the remaining log2(S) rounds
        remaining = n_vars - len(challenges)
        if remaining > 0:
            host = HostTables(
                field,
                [
                    [
                        dev.decode_ints(field, np.asarray(jax.device_get(t3))[ti].reshape(L, -1))
                        for ti in range(t3.shape[0])
                    ]
                    for t3 in terms3
                ],
            )
            for _ in range(remaining):
                round_poly = host.round_sums(degree)
                transcript.append(field.elements_to_bytes(round_poly))
                challenge = transcript.sample_field_element(field)
                host = host.fold(challenge)
                round_polys.append(round_poly)
                challenges.append(challenge)

        return SumcheckProof(sum=sum, round_polys=round_polys), challenges
