"""Device-resident GKR prover chain: ONE host sync per prove.

The layered flow of zk_tpu.gkr.GKRProver.prove is correct but pays a
host round-trip per phase sumcheck (its final device_get), one per line
restriction (decode of the q coefficients), plus host Keccak between —
~10 syncs per prove, each a ~26 ms RTT on the axon tunnel.

This module keeps the ENTIRE per-layer protocol on device: the sponge
state (transcript.device), the sumcheck round loop (capacity
run_device_rounds, which now also yields Montgomery-form challenges),
the eq-table expansion for the next phase (gkr.device._eq_expand over
device challenge rows), W(u) (a device fold at device challenges), the
line restriction + its q evaluations, the [w_b, w_c] / q_evals
absorption, the r* squeeze, and the next layer's claim m = q(r*) and
point r = b* + r*(c* - b*).  The only host syncs are the output-layer
fetch (its bytes are proof data AND the first transcript absorb) and
ONE final device_get that pulls every round polynomial, challenge,
q_evals vector, layer claim, and the sponge state for proof assembly.

Byte-exactness: every absorb/squeeze matches the host-loop prover
step-for-step (same canonical serialization, same order: bind m ->
phase-1 rounds -> phase-2 rounds -> [w_b, w_c] -> q_evals -> r*), so
the emitted GKRProof is identical to GKRProver.prove's host-synced
path and to the dense differential oracle (tests/test_gkr.py).

Reference anchors: the subclaim flow this drives is shaped by
sumcheck/src/prover.rs:24-30 and verifier.rs:38-41; the per-round
absorb order is prover.rs:59-64.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from zk_tpu.fields import device as dev
from zk_tpu.fields import limb_math as lm
from zk_tpu.fields.field import Field
from zk_tpu.poly import MLE, ProductPoly, SumOfProducts
from zk_tpu.sumcheck import SumcheckProof, _poly_to_tables
from zk_tpu.sumcheck import capacity as C
from zk_tpu.transcript import Transcript
from zk_tpu.transcript import device as tdev

U32 = jnp.uint32


def _next_pos(pos: int, nbytes: int) -> int:
    """Sponge buffer position after absorbing nbytes (static math
    mirroring tdev.absorb's block consumption)."""
    return (pos + nbytes) % tdev.RATE


@functools.lru_cache(maxsize=None)
def _one_canon(field: Field) -> np.ndarray:
    """Canonical limbs of 1 as an (L, 1) column: mont_mul(x_m, 1)
    un-scales Montgomery form."""
    return np.array(lm.np_limbs(1, field.n_limbs), dtype=np.uint32).reshape(
        field.n_limbs, 1
    )


@functools.lru_cache(maxsize=None)
def _bind_fn(field: Field, pos: int):
    """jit: absorb the canonical BE bytes of one Montgomery (L, 1)
    element (the layer claim m) into the device sponge."""

    @jax.jit
    def run(lo, hi, buf, m_mont):
        canon = dev.mont_mul(field, m_mont, jnp.asarray(_one_canon(field)))
        data = tdev.serialize_canonical(field, canon)
        lo, hi, buf, _ = tdev.absorb(lo, hi, buf, pos, data)
        return lo, hi, buf

    return run


@functools.lru_cache(maxsize=None)
def _vand_consts(field: Field, k: int) -> np.ndarray:
    """(L, k+1, k+1): [:, d, t] = limbs of (t^d * R mod p), so
    mont_mul(c_m[d], V[:, d, t]) = c_d * t^d in Montgomery form and the
    d-sum is q(t)_m — the line-restriction evaluations at t = 0..k."""
    L = field.n_limbs
    out = np.zeros((L, k + 1, k + 1), dtype=np.uint32)
    for t in range(k + 1):
        for d in range(k + 1):
            out[:, d, t] = np.array(
                lm.np_limbs((pow(t, d, field.p) * field.R) % field.p, L),
                dtype=np.uint32,
            )
    return out


@functools.lru_cache(maxsize=None)
def _line_step_fn(field: Field, k: int, pos: int):
    """jit: the whole end-of-layer reduction in one dispatch.

    Inputs: sponge (lo, hi, buf) at static pos, the (L, 2^k) lower wire
    table, and the two claim points u (= b*), v (= c*) as (L, k)
    Montgomery columns.  Computes the line q(t) = W~(u + t(v - u))
    symbolically (gkr.device._line_fold_kernel), its evaluations at
    t = 0..k, absorbs elements_to_bytes([w_b, w_c]) ++
    elements_to_bytes(q_evals) (gkr/__init__.py order), squeezes r*,
    and returns the next layer's point r = u + r*(v - u) as (k, L)
    rows, the next claim m = q(r*) (Montgomery), and the canonical
    (L, k+1) q_evals for the proof."""
    from zk_tpu.gkr.device import _line_fold_kernel

    @jax.jit
    def run(lo, hi, buf, w_dev, u_lk, v_lk):
        ds_lk = dev.sub_mod(field, v_lk, u_lk)  # (L, k)
        coeffs = _line_fold_kernel.__wrapped__(
            field, k, w_dev, jnp.transpose(u_lk), jnp.transpose(ds_lk)
        )  # (L, k+1) Montgomery coefficients of q
        V = jnp.asarray(_vand_consts(field, k))
        evals_m = dev.sum_mod(
            field, dev.mont_mul(field, coeffs[:, :, None], V), axis=1
        )  # (L, k+1): q(0..k); q(0) = w_b, q(1) = w_c
        one = jnp.asarray(_one_canon(field))
        evals_c = dev.mont_mul(field, evals_m, one)
        data = tdev.serialize_canonical(
            field, jnp.concatenate([evals_c[:, :2], evals_c], axis=1)
        )
        lo, hi, buf, pos2 = tdev.absorb(lo, hi, buf, pos, data)
        lo, hi, buf, _p, digest = tdev.sample_challenge(lo, hi, buf, pos2)
        r_star_m, _r_star_c = tdev.challenge_from_digest(field, digest)
        r_next = dev.add_mod(
            field, u_lk, dev.mont_mul(field, ds_lk, r_star_m)
        )  # (L, k)
        m_next = coeffs[:, k : k + 1]
        for d in range(k - 1, -1, -1):
            m_next = dev.add_mod(
                field, dev.mont_mul(field, m_next, r_star_m), coeffs[:, d : d + 1]
            )
        return lo, hi, buf, evals_c, jnp.transpose(r_next), m_next

    return run


def _run_phase(field, poly, pos, lo, hi, buf, use_pallas):
    """All n_vars rounds of one phase sumcheck on device; returns
    (per-round (L, D+1) canonical sums, (L, n_vars) Montgomery
    challenges, lo, hi, buf)."""
    terms = _poly_to_tables(poly)
    stacks = [jnp.stack(term) for term in terms]
    ks = tuple(s.shape[0] for s in stacks)
    n_vars = poly.n_vars
    sums, _chc, chm, lo, hi, buf, _stacks, _sz = C.run_device_rounds(
        field, 2, ks, stacks, n_vars, pos, False, lo, hi, buf, use_pallas
    )
    u_lk = jnp.concatenate(chm, axis=1)  # (L, n_vars)
    return sums, u_lk, lo, hi, buf


def prove_chain(field: Field, circuit, inputs):
    """Device-resident GKR prove (mesh-less tier; p > 2^32).  Returns
    (GKRProof, levels) — byte-identical to GKRProver.prove."""
    from zk_tpu.fields.pallas_kernels import on_tpu
    from zk_tpu.gkr import GKRProof, LayerProof
    from zk_tpu.gkr import device as gdev
    from zk_tpu.utils import timer

    use_pallas = on_tpu()
    nb = field.n_bytes
    L = field.n_limbs

    with timer("gkr witness (device circuit eval + output fetch)"):
        levels = gdev.evaluate_device(circuit, field, inputs)
        n_out = len(circuit.layers[0])
        # ONE 16 MB-class fetch; parsing the bytes into proof ints is
        # deferred until the layer chain is enqueued (it then overlaps
        # the device drain — ~0.2 s of host work off the critical path)
        out_bytes = dev.decode_bytes_be(field, levels[0])[: n_out * nb]

    transcript = Transcript()
    with timer("gkr bind outputs + r0"):
        transcript.append(out_bytes)
        r = transcript.sample_n_field_elements(field, circuit.layer_k(0))
        m_mont = gdev.mle_eval_points(field, levels[0], [r])  # (L, 1), on device

    lanes, pend = transcript.export_state()
    lo, hi, buf, pos = tdev.state_to_device(lanes, pend)
    r_kl = gdev._mont_rs(field, r)  # (k0, L)

    per_layer = []  # (m_mont, sums, q_evals_canon) device handles
    with timer("gkr layer chain (async dispatches)"):
        for i in range(circuit.depth):
            k_out = circuit.layer_k(i)
            k_in = circuit.layer_k(i + 1)
            eq_r = (
                gdev._eq_expand(field, k_out, r_kl)
                if k_out
                else jnp.asarray(dev.const_limbs(field, 1)).reshape(L, 1)
            )
            w_dev = levels[i + 1]

            # ---- phase 1 over b: bind m, then G1(b) W(b) + A2(b)
            g1, a2 = gdev.phase1_tables_auto(field, circuit, i, eq_r, w_dev)
            m_layer = m_mont
            lo, hi, buf = _bind_fn(field, pos)(lo, hi, buf, m_layer)
            w = MLE(field, k_in, w_dev)
            poly1 = SumOfProducts(
                [ProductPoly([MLE(field, k_in, g1), w]), ProductPoly([MLE(field, k_in, a2)])]
            )
            sums1, u_lk, lo, hi, buf = _run_phase(
                field, poly1, _next_pos(pos, nb), lo, hi, buf, use_pallas
            )

            # ---- phase 2 over c, b fixed at u (claim already bound)
            from zk_tpu.poly.mle import _fold_kernel as _mle_fold

            eq_u = gdev._eq_expand(field, k_in, jnp.transpose(u_lk))
            wu = _mle_fold(field, k_in, 0, k_in, w_dev, jnp.transpose(u_lk))
            add_u, mul_u_s, w_shift = gdev.phase2_tables_auto(
                field, circuit, i, eq_r, eq_u, w_dev, wu
            )
            poly2 = SumOfProducts(
                [
                    ProductPoly([MLE(field, k_in, add_u), MLE(field, k_in, w_shift)]),
                    ProductPoly([MLE(field, k_in, mul_u_s), MLE(field, k_in, w_dev)]),
                ]
            )
            sums2, v_lk, lo, hi, buf = _run_phase(
                field, poly2, 32, lo, hi, buf, use_pallas
            )

            # ---- line restriction + r* + next (r, m), one dispatch
            lo, hi, buf, q_canon, r_kl, m_mont = _line_step_fn(field, k_in, 32)(
                lo, hi, buf, w_dev, u_lk, v_lk
            )
            pos = 32
            per_layer.append((m_layer, sums1 + sums2, q_canon))

    # outputs parse while the enqueued chain drains on device
    with timer("gkr parse outputs (overlaps device drain)"):
        outputs = [
            int.from_bytes(out_bytes[i * nb : (i + 1) * nb], "big")
            for i in range(n_out)
        ]

    # ---- THE one sync: every proof component + the sponge state
    with timer("gkr final sync + proof assembly"):
        fetched = jax.device_get((per_layer, lo, hi, buf))
        got_layers, lo_h, hi_h, buf_h = fetched
        layer_proofs = []
        for m_dev, sums, q_canon in got_layers:
            m_int = dev.decode_ints(field, m_dev)[0]
            round_polys = [dev.decode_ints(field, s, mont=False) for s in sums]
            q_evals = dev.decode_ints(field, q_canon, mont=False)
            layer_proofs.append(
                LayerProof(
                    sumcheck=SumcheckProof(sum=m_int, round_polys=round_polys),
                    w_b=q_evals[0],
                    w_c=q_evals[1],
                    q_evals=q_evals,
                )
            )
        lanes = [int(lo_h[j]) | (int(hi_h[j]) << 32) for j in range(25)]
        pend = bytes(int(x) & 0xFF for x in buf_h[:pos])
        transcript.import_state(lanes, pend)

    return (
        GKRProof(outputs=outputs, layer_proofs=layer_proofs, outputs_bytes=out_bytes),
        levels,
    )
