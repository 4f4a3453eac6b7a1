"""Mesh-sharded sumcheck prover — byte-identical proofs to single-chip.

Layout: a 2^n table is viewed as (W, D) with flat natural index
w * D + d.  The D axis (the LAST log2(D) index bits = the LATE
variables) is sharded across the mesh, one column per device; the W
axis (the EARLY variables, which sumcheck folds first) is each device's
local buffer at stride 1.  A device's local slice is therefore EXACTLY
a single-chip capacity stack (k, L, W): the fold of variable 0 pairs
local indices (w, w + W/2) — contiguous halves — so the same in-place
Pallas capacity kernels that serve the single-chip prover
(zk_tpu.sumcheck.capacity) run unmodified inside shard_map, and the
only collective is ONE psum of the (degree+1) round sums per round.

Round orchestration mirrors capacity.run_device_rounds
dispatch-for-dispatch: per-round cached jitted programs (local sums ->
psum -> replicated on-device sponge -> shard-local in-place fold), with
the degree-1 single-factor steady state fused into ONE dispatch per
round (transcript + fold + the folded table's half sums).  The capacity
kernels take the live size as a scalar operand with a dynamic grid, so
cold compile is a handful of capacity-shaped programs — NOT a per-size
ladder and NOT a whole-loop unroll (the round-3 design this replaces,
which re-imported the 250 s cold-compile disease at exactly the
north-star scale).

When W reaches the tail threshold the surviving tiny table is gathered
and the remaining rounds run on host ints (gather-to-replicated cheap
tail, SURVEY.md §7 risk 4).  The transcript, challenge flow, and
emitted bytes are identical to zk_tpu.sumcheck.SumcheckProver
(prover.rs:44-68 semantics) — sharding is invisible to the verifier.

Scaling model (BASELINE.md "Scaling model" section): per round each
chip folds size_loc/2 pairs (~3 L^2 uint32 mults each) and the psum
moves (degree+1) * L * 4 bytes — a fixed few-hundred-byte payload vs
O(size_loc) compute, so efficiency stays >80% while size_loc spans the
capacity tier.
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
from zk_tpu.sumcheck import capacity as C
from zk_tpu.sumcheck import kernels as K
from zk_tpu.sumcheck.kernels import HostTables
from zk_tpu.transcript import Transcript

U32 = jnp.uint32


def _axes(mesh: Mesh) -> tuple:
    """All mesh axis names: the table's shard axis splits over the FULL
    mesh (e.g. ("dcn", "ici") for a multi-host slice — ICI within a
    host-group, DCN across; XLA lowers the psum to a hierarchical
    reduction over both links)."""
    return tuple(mesh.axis_names)


def _spec4(axes) -> P:
    """PartitionSpec of a (k, L, D, cap) factor stack: axis 2 sharded."""
    return P(None, None, axes, None)


# --------------------------------------------------------------------------
# local sums -> psum-safe global norm
# --------------------------------------------------------------------------


def _psum_norm(field: Field, norm, axes):
    """(C, L+1) relaxed LOCAL norms (sums of Montgomery representatives)
    -> (C, L+1) relaxed GLOBAL sums, replicated.

    For p > 2^32 the local norm is first renormalized to proper
    Montgomery limbs (< 2^16) so the psum stays exact in uint32 for up
    to 2^16 chips; the result is again a valid "relaxed sum of
    Montgomery representatives", so both the on-device sponge
    (kernels._transcript_round_impl) and the host decode
    (_decode_relaxed_vec) consume it unchanged.  Small fields (p <=
    2^32, CPU-test-only) psum the raw norm: entries < 2^27, exact for
    the test meshes."""
    if field.p > (1 << 32):
        mont = K._canon_sums(field, norm, mont_out=True)  # (L, C), limbs < 2^16
        tot = jax.lax.psum(mont, axes)
        cpts = norm.shape[0]
        return jnp.concatenate([tot.T, jnp.zeros((cpts, 1), U32)], axis=1)
    return jax.lax.psum(norm, axes)


def _sums_norm_local(field: Field, degree: int, ks: tuple, stack):
    """Local (K, L, n) exact-size stack -> (degree+1, L+1) relaxed norm
    (jnp tier; same math as kernels._sums_norm_inner, generalized to a
    combined multi-term stack)."""
    if degree == 1 and ks == (1,):
        return K._norm_chunks(K._half_sums_relaxed(field, stack))
    L = field.n_limbs
    n = stack.shape[-1]
    half = n // 2
    out = []
    for i in range(degree + 1):
        if i >= 2:
            r_i = jnp.asarray(dev.const_limbs(field, i)).reshape(L, 1)
        total = None
        row = 0
        for k in ks:
            prod = None
            for _ in range(k):
                fac = stack[row]
                row += 1
                left, right = fac[:, :half], fac[:, half:]
                if i == 0:
                    ev = left
                elif i == 1:
                    ev = right
                else:
                    ev = dev.lerp(field, left, right, r_i)
                prod = ev if prod is None else dev.mont_mul(field, prod, ev)
            total = prod if total is None else dev.add_mod(field, total, prod)
        out.append(dev.sum_mod(field, total, axis=-1))
    mont = jnp.stack(out)  # (degree+1, L) proper Montgomery sums
    return jnp.concatenate([mont, jnp.zeros((degree + 1, 1), U32)], axis=1)


def _local_cap_sums(field: Field, degree: int, ks: tuple, cap: int, sz, local):
    """Capacity-tier local sums on the live prefix [0, sz) of a
    (sum(ks), L, cap) stack -> (degree+1, L+1) relaxed norm."""
    if len(ks) == 1:
        acc = C._round_sums_cap.__wrapped__(field, degree, ks[0], cap, sz, local)
    else:
        acc = C._round_sums_terms_cap.__wrapped__(field, degree, ks, cap, sz, local)
    return K._norm_block(acc)


# --------------------------------------------------------------------------
# cached per-round dispatches (one jitted program per static config;
# capacity-tier programs serve EVERY round of a prove via the dynamic size)
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _sums_cap_fn(field: Field, degree: int, ks: tuple, cap: int, mesh: Mesh):
    axes = _axes(mesh)
    K_tot = sum(ks)
    L = field.n_limbs

    @jax.jit
    def run(size, stack):
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), _spec4(axes)),
            out_specs=P(),
            check_vma=False,  # pallas out_shapes carry no vma annotation
        )
        def body(sz, st):
            local = st.reshape(K_tot, L, cap)
            return _psum_norm(field, _local_cap_sums(field, degree, ks, cap, sz, local), axes)

        return body(size, stack)

    return run


@functools.lru_cache(maxsize=None)
def _sums_jnp_fn(field: Field, degree: int, ks: tuple, mesh: Mesh):
    axes = _axes(mesh)

    @jax.jit
    def run(stack):
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(_spec4(axes),),
            out_specs=P(),
        )
        def body(st):
            local = st[:, :, 0, :]
            return _psum_norm(field, _sums_norm_local(field, degree, ks, local), axes)

        return body(stack)

    return run


@functools.lru_cache(maxsize=None)
def _transcript_only_fn(field: Field, degree: int, mesh: Mesh, pos: int):
    """Sponge round on an already-psummed norm; no fold (last device
    round when the host tail continues unfolded)."""

    @jax.jit
    def run(pending, lo, hi, buf):
        lo, hi, buf, total, ch_c, _m = K._transcript_round_impl(
            field, degree, pos, lo, hi, buf, (pending,)
        )
        return lo, hi, buf, total, ch_c

    return run


@functools.lru_cache(maxsize=None)
def _transcript_fold_cap_fn(
    field: Field, degree: int, ks: tuple, cap: int, mesh: Mesh, pos: int
):
    """One dispatch: sponge round on the pending sums, then shard-local
    in-place capacity fold at the fresh challenge."""
    axes = _axes(mesh)
    K_tot = sum(ks)
    L = field.n_limbs

    @functools.partial(jax.jit, donate_argnums=(1,))
    def run(size, stack, pending, lo, hi, buf):
        lo, hi, buf, total, ch_c, ch_m = K._transcript_round_impl(
            field, degree, pos, lo, hi, buf, (pending,)
        )

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), _spec4(axes), P(None, None)),
            out_specs=_spec4(axes),
            check_vma=False,  # pallas out_shapes carry no vma annotation
        )
        def body(sz, st, r):
            local = st.reshape(K_tot, L, cap)
            folded = C._fold_cap.__wrapped__(field, K_tot, cap, sz, local, r)
            return folded.reshape(K_tot, L, 1, cap)

        stack = body(size, stack, ch_m)
        return stack, lo, hi, buf, total, ch_c

    return run


@functools.lru_cache(maxsize=None)
def _deg1_cap_fn(field: Field, cap: int, mesh: Mesh, pos: int):
    """Steady-state degree-1 single-factor round in ONE dispatch:
    sponge round on the pending half sums, fused in-place fold + next
    half sums per shard, psum of the next sums — the sharded twin of
    capacity._deg1_round_cap."""
    axes = _axes(mesh)
    L = field.n_limbs

    @functools.partial(jax.jit, donate_argnums=(1,))
    def run(size, stack, pending, lo, hi, buf):
        lo, hi, buf, total, ch_c, ch_m = K._transcript_round_impl(
            field, 1, pos, lo, hi, buf, (pending,)
        )

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), _spec4(axes), P(None, None)),
            out_specs=(_spec4(axes), P()),
            check_vma=False,  # pallas out_shapes carry no vma annotation
        )
        def body(sz, st, r):
            local = st.reshape(1, L, cap)
            folded, acc = C._fold_halfsums_cap.__wrapped__(field, cap, sz, local, r)
            pend = _psum_norm(field, K._norm_block(acc), axes)
            return folded.reshape(1, L, 1, cap), pend

        stack, pending2 = body(size, stack, ch_m)
        return stack, pending2, lo, hi, buf, total, ch_c

    return run


@functools.lru_cache(maxsize=None)
def _transcript_fold_jnp_fn(
    field: Field, degree: int, ks: tuple, mesh: Mesh, pos: int
):
    axes = _axes(mesh)
    K_tot = sum(ks)

    @jax.jit
    def run(stack, pending, lo, hi, buf):
        lo, hi, buf, total, ch_c, ch_m = K._transcript_round_impl(
            field, degree, pos, lo, hi, buf, (pending,)
        )

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(_spec4(axes), P(None, None)),
            out_specs=_spec4(axes),
        )
        def body(st, r):
            local = st[:, :, 0, :]
            half = local.shape[-1] // 2
            out = jnp.stack(
                [
                    dev.lerp(field, local[t][:, :half], local[t][:, half:], r)
                    for t in range(K_tot)
                ]
            )
            return out[:, :, None, :]

        stack = body(stack, ch_m)
        return stack, lo, hi, buf, total, ch_c

    return run


@functools.lru_cache(maxsize=None)
def _fold_cap_only_fn(field: Field, K_tot: int, cap: int, mesh: Mesh):
    """Host-transcript tier: fold at an uploaded challenge."""
    axes = _axes(mesh)
    L = field.n_limbs

    @functools.partial(jax.jit, donate_argnums=(1,))
    def run(size, stack, r):
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), _spec4(axes), P(None, None)),
            out_specs=_spec4(axes),
            check_vma=False,  # pallas out_shapes carry no vma annotation
        )
        def body(sz, st, rr):
            local = st.reshape(K_tot, L, cap)
            folded = C._fold_cap.__wrapped__(field, K_tot, cap, sz, local, rr)
            return folded.reshape(K_tot, L, 1, cap)

        return body(size, stack, r)

    return run


@functools.lru_cache(maxsize=None)
def _fold_jnp_only_fn(field: Field, K_tot: int, mesh: Mesh):
    axes = _axes(mesh)

    @jax.jit
    def run(stack, r):
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(_spec4(axes), P(None, None)),
            out_specs=_spec4(axes),
        )
        def body(st, rr):
            local = st[:, :, 0, :]
            half = local.shape[-1] // 2
            out = jnp.stack(
                [
                    dev.lerp(field, local[t][:, :half], local[t][:, half:], rr)
                    for t in range(st.shape[0])
                ]
            )
            return out[:, :, None, :]

        return body(stack, r)

    return run


# --------------------------------------------------------------------------
# host decode of psummed norms
# --------------------------------------------------------------------------


def _decode_relaxed_vec(field: Field, arr) -> list[int]:
    """(C, L+1) relaxed uint32 limb rows (sums of Montgomery values) ->
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


def _gather_host_tables(field: Field, stack, ks: tuple, size_loc: int) -> HostTables:
    """(K, L, D, size_loc) sharded stack -> natural-order host int
    tables (natural index e = w * D + d).  The tail table is tiny (at
    most the chain-tail threshold) so the gather is one device_get and
    the reorder happens in numpy — no resharding of device arrays."""
    a = np.asarray(jax.device_get(stack))  # (K, L, D, size_loc)
    K_tot, L = a.shape[0], a.shape[1]
    nat = np.ascontiguousarray(a.transpose(0, 1, 3, 2)).reshape(K_tot, L, -1)
    terms, row = [], 0
    for k in ks:
        term = []
        for _ in range(k):
            term.append(dev.decode_ints(field, nat[row]))
            row += 1
        terms.append(term)
    return HostTables(field, terms)


# --------------------------------------------------------------------------
# prover
# --------------------------------------------------------------------------


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
        from zk_tpu.fields.pallas_kernels import on_tpu
        from zk_tpu.transcript import device as tdev

        field: Field = poly.field
        degree = max_var_degree if max_var_degree is not None else poly.max_degree
        if bind_sum:
            transcript.append(field.to_bytes_be(sum))

        use_pallas = on_tpu()
        if device_transcript is None:
            device_transcript = use_pallas and field.p > (1 << 32)
        device_transcript = device_transcript and field.p > (1 << 32)

        n_vars = poly.n_vars
        n = 1 << n_vars
        d_mesh = mesh.devices.size
        L = field.n_limbs
        if d_mesh & (d_mesh - 1):
            # the shard axis D must divide the power-of-two table;
            # TPU slices are power-of-two meshes
            raise ValueError(
                f"sharded sumcheck requires a power-of-two mesh, got {d_mesh}"
            )

        terms = _poly_to_tables(poly)
        ks = tuple(len(t) for t in terms)
        K_tot = len(ks) and int(np.sum(ks))

        round_polys: list[list[int]] = []
        challenges: list[int] = []

        # device rounds stop once the global live table is this small;
        # the TPU threshold matches the single-chip chain tail (below
        # ~128 elements host bigints beat per-round dispatches), the CPU
        # threshold is the structural minimum so tests cover the
        # collective path at small sizes
        chain_tail = max(128, 2 * d_mesh) if use_pallas else 2 * d_mesh

        if n <= chain_tail:
            host = HostTables(
                field,
                [[dev.decode_ints(field, f) for f in term] for term in terms],
            )
            return _host_rounds(
                field, degree, transcript, host, n_vars, sum, round_polys, challenges
            )

        w0 = n // d_mesh  # per-device capacity (local table size)
        cap = w0
        if use_pallas and cap * len(ks) > C.MAX_SINGLE_CHIP:
            raise ValueError(
                f"per-chip table slice {cap} x {len(ks)} terms exceeds the "
                f"capacity-kernel bound ({C.MAX_SINGLE_CHIP} / terms); use a "
                f"larger mesh"
            )

        # materialize the combined (K, L, D, cap) stack: natural index
        # e = w * D + d -> position [d, w]
        axes = _axes(mesh)
        sharding = NamedSharding(mesh, _spec4(axes))
        rows = []
        for term in terms:
            for f in term:
                rows.append(f.reshape(L, w0, d_mesh).transpose(0, 2, 1))
        stack = jax.device_put(jnp.stack(rows), sharding)
        del rows

        rounds = 0
        g, size = n, w0
        while g > chain_tail and size > 1:
            rounds += 1
            g //= 2
            size //= 2
        fold_last = rounds < n_vars
        size = w0

        deg1 = degree == 1 and ks == (1,)
        in_cap = use_pallas and cap >= C.CAP_MIN

        def sz(s):
            return jnp.asarray(s, jnp.int32)

        if device_transcript:
            # device-resident Fiat-Shamir over the mesh: psum'd sums feed
            # the replicated on-device sponge, the challenge feeds the
            # shard-local fold — no per-round host sync; ONE device_get
            # at the end (same pattern as the single-chip tier).
            rep = NamedSharding(mesh, P())
            lanes, pend = transcript.export_state()
            lo, hi, buf, pos = tdev.state_to_device(lanes, pend)
            lo, hi, buf = (jax.device_put(a, rep) for a in (lo, hi, buf))
            sums_dev, chall_dev = [], []
            pending = None
            p = pos
            for rnd in range(rounds):
                last = rnd == rounds - 1
                will_fold = (not last) or fold_last
                if pending is None:
                    if in_cap:
                        pending = _sums_cap_fn(field, degree, ks, cap, mesh)(
                            sz(size), stack
                        )
                    else:
                        pending = _sums_jnp_fn(field, degree, ks, mesh)(stack)
                if not will_fold:
                    lo, hi, buf, total, ch_c = _transcript_only_fn(
                        field, degree, mesh, p
                    )(pending, lo, hi, buf)
                    pending = None
                elif in_cap and deg1 and not last:
                    stack, pending, lo, hi, buf, total, ch_c = _deg1_cap_fn(
                        field, cap, mesh, p
                    )(sz(size), stack, pending, lo, hi, buf)
                    size //= 2
                elif in_cap:
                    stack, lo, hi, buf, total, ch_c = _transcript_fold_cap_fn(
                        field, degree, ks, cap, mesh, p
                    )(sz(size), stack, pending, lo, hi, buf)
                    pending = None
                    size //= 2
                else:
                    stack, lo, hi, buf, total, ch_c = _transcript_fold_jnp_fn(
                        field, degree, ks, mesh, p
                    )(stack, pending, lo, hi, buf)
                    pending = None
                    size //= 2
                if in_cap and will_fold and size < C.CAP_MIN:
                    stack = stack[:, :, :, :size]
                    in_cap = False
                p = 32
                sums_dev.append(total)
                chall_dev.append(ch_c)
            # single sync point; also restores the host transcript sponge
            # (keeps chained protocols correct — GKR appends more onto it)
            got_sums, got_chs, lo_h, hi_h, buf_h = jax.device_get(
                (sums_dev, chall_dev, lo, hi, buf)
            )
            pos = 32 if rounds else pos
            for total, ch in zip(got_sums, got_chs):
                round_polys.append(dev.decode_ints(field, total, mont=False))
                challenges.append(dev.decode_ints(field, ch, mont=False)[0])
            lanes = [int(lo_h[i]) | (int(hi_h[i]) << 32) for i in range(25)]
            pend = bytes(int(x) & 0xFF for x in buf_h[:pos])
            transcript.import_state(lanes, pend)
        else:
            rep = NamedSharding(mesh, P())
            for rnd in range(rounds):
                last = rnd == rounds - 1
                will_fold = (not last) or fold_last
                if in_cap:
                    norm = _sums_cap_fn(field, degree, ks, cap, mesh)(
                        sz(size), stack
                    )
                else:
                    norm = _sums_jnp_fn(field, degree, ks, mesh)(stack)
                round_poly = _decode_relaxed_vec(field, norm)
                transcript.append(field.elements_to_bytes(round_poly))
                challenge = transcript.sample_field_element(field)
                if will_fold:
                    r = jax.device_put(
                        jnp.asarray(dev.const_limbs(field, challenge)).reshape(L, 1),
                        rep,
                    )
                    if in_cap:
                        stack = _fold_cap_only_fn(field, K_tot, cap, mesh)(
                            sz(size), stack, r
                        )
                    else:
                        stack = _fold_jnp_only_fn(field, K_tot, mesh)(stack, r)
                    size //= 2
                    if in_cap and size < C.CAP_MIN:
                        stack = stack[:, :, :, :size]
                        in_cap = False
                round_polys.append(round_poly)
                challenges.append(challenge)

        # gather-to-host tail for the remaining rounds
        remaining = n_vars - len(challenges)
        if remaining > 0:
            if in_cap and size < cap:
                stack = stack[:, :, :, :size]
            host = _gather_host_tables(field, stack, ks, size)
            for _ in range(remaining):
                round_poly = host.round_sums(degree)
                transcript.append(field.elements_to_bytes(round_poly))
                challenge = transcript.sample_field_element(field)
                host = host.fold(challenge)
                round_polys.append(round_poly)
                challenges.append(challenge)

        return SumcheckProof(sum=sum, round_polys=round_polys), challenges


def _host_rounds(field, degree, transcript, host, n_vars, claimed, round_polys, challenges):
    """All-host prove for tables at/below the chain tail."""
    for _ in range(n_vars):
        round_poly = host.round_sums(degree)
        transcript.append(field.elements_to_bytes(round_poly))
        challenge = transcript.sample_field_element(field)
        host = host.fold(challenge)
        round_polys.append(round_poly)
        challenges.append(challenge)
    return SumcheckProof(sum=claimed, round_polys=round_polys), challenges
