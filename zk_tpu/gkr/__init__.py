"""GKR: layered-circuit interactive proof driving one sumcheck per layer.

Reconstructed from the PAZK protocol (the reference snapshot lacks its
gkr crate — readme.md:9, SURVEY.md §0/§2 #13) on top of the subclaim API
the reference's sumcheck was shaped for (prove_partial returns
challenges, verify_partial returns SubClaim — sumcheck/src/prover.rs:24-30,
verifier.rs:38-41).

Per layer i, with current claim m_i = W~_i(r_i), the prover runs a
sumcheck over (b, c) in {0,1}^{2k} for

  f(b,c) = add~_i(r_i,b,c) * (W~_{i+1}(b) + W~_{i+1}(c))
         + mul~_i(r_i,b,c) *  W~_{i+1}(b) * W~_{i+1}(c)

expressed as a SumOfProducts of multilinear factor tables on device:
add_r/mul_r (eq(r_i, a)-weighted scatters of the wiring), W repeated
along c, W tiled along b, and their sum — per-variable degree 2, so
3-point round polys.  The two resulting claims W(b*), W(c*) are reduced
to one by the canonical line restriction q(t) = W~(l(t)),
l(t) = b* + t(c* - b*): the verifier checks q(0), q(1) against the
claimed values, samples r*, and proceeds with m_{i+1} = q(r*) at
r_{i+1} = l(r*).  The final claim is checked against the input MLE.

Fiat-Shamir layout (this library's own, there being no reference one):
outputs bytes -> sample r_0 -> per layer [sumcheck transcript ->
w_b, w_c bytes -> q evals bytes -> sample r*].
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

import jax
import jax.numpy as jnp

from zk_tpu.fields import device as dev
from zk_tpu.fields.field import Field
from zk_tpu.gkr.circuit import ADD, Circuit, Gate  # noqa: F401
from zk_tpu.poly import MLE, ProductPoly, SumOfProducts, UnivariatePolynomial
from zk_tpu.poly.hypercube import binary_string
from zk_tpu.sumcheck import (
    SubClaim,
    SumcheckError,
    SumcheckProof,
    SumcheckProver,
    SumcheckVerifier,
)
from zk_tpu.transcript import Transcript


class GKRError(Exception):
    pass


@dataclass
class LayerProof:
    sumcheck: SumcheckProof
    w_b: int
    w_c: int
    q_evals: list[int]  # q(0..k) on the line through (b*, c*)


@dataclass
class GKRProof:
    outputs: list[int]
    layer_proofs: list[LayerProof]
    # canonical BE serialization of `outputs`, when already at hand
    # (prover fetched it; from_bytes parsed it) — saves the verifier a
    # 2^19-iteration int.to_bytes loop (~0.24 s at the bench scale).
    # Pure cache: excluded from equality; always identical to
    # field.elements_to_bytes(outputs) for canonical values.
    outputs_bytes: bytes | None = dc_field(default=None, compare=False)
    # verifier-populated cache of the device-encoded padded output table
    # (a pure function of outputs_bytes): repeated verifications of the
    # same proof skip the output-table upload — on the axon tunnel a
    # 16 MB upload costs ~0.5 s, ~500x its real PCIe cost.  Excluded
    # from equality; never trusted across proofs (keyed checks below).
    _out_dev: object = dc_field(default=None, compare=False, repr=False)


# --------------------------------------------------------------------------
# eq / MLE helpers (host ints)
# --------------------------------------------------------------------------


def eq_weight(field: Field, point: list[int], bits: str) -> int:
    """eq(point, bits) = prod_j (p_j b_j + (1-p_j)(1-b_j))."""
    acc = 1
    for p_j, ch in zip(point, bits):
        term = p_j if ch == "1" else (1 - p_j) % field.p
        acc = field.mul(acc, term)
    return acc


def mle_eval_host(field: Field, values: list[int], point: list[int]) -> int:
    """Evaluate the MLE of a padded value vector at a point (host ints,
    successive fold from var 0 = MSB — same math as evaluation_form.rs)."""
    vals = [v % field.p for v in values]
    for r in point:
        half = len(vals) // 2
        vals = [
            (vals[e] - r * (vals[e] - vals[e + half])) % field.p for e in range(half)
        ]
    return vals[0]


def _wiring_eval_host(
    field: Field, circuit: Circuit, layer: int, op: str, point: list[int]
) -> int:
    """Evaluate add~_i / mul~_i at (r, b, c) — verifier-side, from the
    circuit structure (sum of eq terms over the layer's gates of that op)."""
    k_out = circuit.layer_k(layer)
    k_in = circuit.layer_k(layer + 1)
    r, bc = point[:k_out], point[k_out:]
    b_pt, c_pt = bc[:k_in], bc[k_in:]
    total = 0
    for a, gate in enumerate(circuit.layers[layer]):
        if gate.op != op:
            continue
        w = eq_weight(field, r, binary_string(a, k_out))
        w = field.mul(w, eq_weight(field, b_pt, binary_string(gate.left, k_in)))
        w = field.mul(w, eq_weight(field, c_pt, binary_string(gate.right, k_in)))
        total = field.add(total, w)
    return total


def _build_layer_tables(
    field: Field, circuit: Circuit, layer: int, r: list[int], w_below: list[int]
):
    """Device factor tables over (b, c) for the layer polynomial."""
    k_in = circuit.layer_k(layer + 1)
    k_out = circuit.layer_k(layer)
    size_in = 1 << k_in
    size_bc = size_in * size_in

    # sparse scatter of eq(r, a) weights at (left, right) positions
    add_vals = [0] * size_bc
    mul_vals = [0] * size_bc
    for a, gate in enumerate(circuit.layers[layer]):
        wgt = eq_weight(field, r, binary_string(a, k_out))
        pos = gate.left * size_in + gate.right
        if gate.op == ADD:
            add_vals[pos] = field.add(add_vals[pos], wgt)
        else:
            mul_vals[pos] = field.add(mul_vals[pos], wgt)

    add_r = MLE.new(field, 2 * k_in, add_vals)
    mul_r = MLE.new(field, 2 * k_in, mul_vals)

    w_dev = dev.encode_ints(field, w_below)  # (L, 2^k)
    L = field.n_limbs
    # index (b, c) = b * 2^k + c with b on the MSB half (var order b then c)
    wb = MLE(field, 2 * k_in, jnp.repeat(w_dev, size_in, axis=1))
    wc = MLE(field, 2 * k_in, jnp.tile(w_dev, (1, size_in)))
    wsum = MLE(field, 2 * k_in, dev.add_mod(field, wb.data, wc.data))

    return SumOfProducts(
        [ProductPoly([add_r, wsum]), ProductPoly([mul_r, wb, wc])]
    )


# --------------------------------------------------------------------------
# prover
# --------------------------------------------------------------------------


class GKRProver:
    @staticmethod
    def prove(
        field: Field,
        circuit: Circuit,
        inputs: list[int],
        tail_size: int | None = None,
        device_transcript: bool | None = None,
        mesh=None,
    ) -> tuple[GKRProof, list[jnp.ndarray]]:
        """Prove circuit(inputs) = outputs; returns (proof, device wire
        levels).  Linear-time prover: witness generation, wiring tables,
        and W evaluations all run on device; each layer is two chained
        k-round sumchecks over O(2^k)-size tables (zk_tpu.gkr.device)
        whose round polynomials — and therefore the whole proof — are
        byte-identical to the dense O(4^k) path (prove_dense).

        With a mesh, witness generation runs gate-sharded under GSPMD
        and every layer sumcheck large enough to split runs through
        ShardedSumcheckProver (shard-local folds + one psum per round) —
        the emitted proof bytes are identical to the single-chip path,
        so sharding stays invisible to the verifier."""
        from zk_tpu.gkr import device as gdev
        from zk_tpu.utils import timer

        if (
            mesh is None
            and device_transcript is not False
            and tail_size is None
            and field.p > (1 << 32)
            and all(circuit.layer_k(i + 1) >= 1 for i in range(circuit.depth))
        ):
            # device-resident layer chain: sponge + challenges never
            # leave the chip; ONE proof-assembly sync (zk_tpu.gkr.chain)
            from zk_tpu.gkr.chain import prove_chain

            return prove_chain(field, circuit, inputs)

        with timer("gkr witness (device circuit eval)"):
            levels = gdev.evaluate_device(circuit, field, inputs, mesh=mesh)
            # ONE fetch of the output level as canonical BE bytes: the
            # ints (proof.outputs) parse from slices and the transcript
            # absorbs the same bytes verbatim (elements_to_bytes is
            # exactly this concatenation) — round 3 fetched + re-encoded
            # the 2^19-element layer twice.
            nb = field.n_bytes
            n_out = len(circuit.layers[0])
            out_bytes = dev.decode_bytes_be(field, levels[0])[: n_out * nb]
            outputs = [
                int.from_bytes(out_bytes[i * nb : (i + 1) * nb], "big")
                for i in range(n_out)
            ]

        transcript = Transcript()
        with timer("gkr bind outputs + r0"):
            transcript.append(out_bytes)
            r = transcript.sample_n_field_elements(field, circuit.layer_k(0))
            m = dev.decode_ints(field, gdev.mle_eval_points(field, levels[0], [r]))[0]

        layer_proofs: list[LayerProof] = []
        for i in range(circuit.depth):
            k_in = circuit.layer_k(i + 1)
            w_dev = levels[i + 1]
            with timer(f"layer {i} eq_r table"):
                eq_r = gdev.eq_table(field, r)

            use_mesh = mesh is not None and (1 << k_in) >= 2 * mesh.devices.size

            # phase 1: sum over b of G1(b) W(b) + A2(b) — binds the claim
            with timer(f"layer {i} phase1 tables"):
                poly1 = gdev.build_phase1(field, circuit, i, eq_r, w_dev)
            t1 = timer(f"layer {i} phase1 sumcheck"); t1.__enter__()
            if use_mesh:
                from zk_tpu.parallel import ShardedSumcheckProver

                proof1, u = ShardedSumcheckProver._prove_internal(
                    mesh,
                    poly1,
                    m,
                    transcript,
                    max_var_degree=2,
                    device_transcript=device_transcript,
                )
            else:
                proof1, u = SumcheckProver._prove_internal(
                    poly1,
                    m,
                    transcript,
                    max_var_degree=2,
                    tail_size=tail_size,
                    device_transcript=device_transcript,
                )
            t1.__exit__(None, None, None)
            if proof1.round_polys:
                last = UnivariatePolynomial.interpolate(field, proof1.round_polys[-1])
                m2 = last.evaluate(u[-1])
            else:
                m2 = m

            # phase 2: sum over c with b fixed at u (claim already bound)
            with timer(f"layer {i} phase2 tables"):
                poly2, _wu = gdev.build_phase2(field, circuit, i, eq_r, u, w_dev)
            t2 = timer(f"layer {i} phase2 sumcheck"); t2.__enter__()
            if use_mesh:
                proof2, v = ShardedSumcheckProver._prove_internal(
                    mesh,
                    poly2,
                    m2,
                    transcript,
                    max_var_degree=2,
                    device_transcript=device_transcript,
                    bind_sum=False,
                )
            else:
                proof2, v = SumcheckProver._prove_internal(
                    poly2,
                    m2,
                    transcript,
                    max_var_degree=2,
                    tail_size=tail_size,
                    device_transcript=device_transcript,
                    bind_sum=False,
                )
            t2.__exit__(None, None, None)
            proof = SumcheckProof(
                sum=m, round_polys=proof1.round_polys + proof2.round_polys
            )
            b_star, c_star = u, v

            # the line restriction q(t) = W~(b* + t(c*-b*)) at t = 0..k_in
            # (q(0) = W(b*), q(1) = W(c*)): ONE symbolic fold dispatch +
            # one small decode (gdev.line_restriction_evals)
            with timer(f"layer {i} line restriction evals"):
                q_evals = gdev.line_restriction_evals(field, w_dev, b_star, c_star)
            w_b = q_evals[0]
            w_c = q_evals[1] if k_in >= 1 else q_evals[0]
            q_evals = q_evals if k_in >= 1 else [w_b]
            transcript.append(field.elements_to_bytes([w_b, w_c]))
            transcript.append(field.elements_to_bytes(q_evals))

            r_star = transcript.sample_field_element(field)
            r = [(b + r_star * (c - b)) % field.p for b, c in zip(b_star, c_star)]
            q = UnivariatePolynomial.interpolate(field, q_evals)
            m = q.evaluate(r_star)

            layer_proofs.append(
                LayerProof(sumcheck=proof, w_b=w_b, w_c=w_c, q_evals=q_evals)
            )

        return (
            GKRProof(
                outputs=outputs, layer_proofs=layer_proofs, outputs_bytes=out_bytes
            ),
            levels,
        )

    @staticmethod
    def prove_dense(
        field: Field, circuit: Circuit, inputs: list[int]
    ) -> tuple[GKRProof, list[list[int]]]:
        """The dense O(4^k)-per-layer prover over explicit (b, c) factor
        tables — the differential oracle for `prove` (identical bytes)."""
        levels = circuit.evaluate(field, inputs)
        outputs = levels[0][: len(circuit.layers[0])]

        transcript = Transcript()
        transcript.append(field.elements_to_bytes(outputs))
        r = transcript.sample_n_field_elements(field, circuit.layer_k(0))
        m = mle_eval_host(field, levels[0], r)

        layer_proofs: list[LayerProof] = []
        for i in range(circuit.depth):
            k_in = circuit.layer_k(i + 1)
            poly = _build_layer_tables(field, circuit, i, r, levels[i + 1])
            proof, challenges = SumcheckProver._prove_internal(
                poly, m, transcript, max_var_degree=2
            )
            b_star, c_star = challenges[:k_in], challenges[k_in:]

            w_b = mle_eval_host(field, levels[i + 1], b_star)
            w_c = mle_eval_host(field, levels[i + 1], c_star)
            transcript.append(field.elements_to_bytes([w_b, w_c]))

            # line restriction q(t) = W~(l(t)), l(t) = b* + t(c* - b*),
            # degree <= k_in: send evaluations at t = 0..k_in
            q_evals = []
            for t in range(k_in + 1):
                if t == 0:
                    q_evals.append(w_b)
                elif t == 1:
                    q_evals.append(w_c)
                else:
                    pt = [
                        (b + t * (c - b)) % field.p for b, c in zip(b_star, c_star)
                    ]
                    q_evals.append(mle_eval_host(field, levels[i + 1], pt))
            transcript.append(field.elements_to_bytes(q_evals))

            r_star = transcript.sample_field_element(field)
            r = [(b + r_star * (c - b)) % field.p for b, c in zip(b_star, c_star)]
            q = UnivariatePolynomial.interpolate(field, q_evals)
            m = q.evaluate(r_star)

            layer_proofs.append(
                LayerProof(sumcheck=proof, w_b=w_b, w_c=w_c, q_evals=q_evals)
            )

        return GKRProof(outputs=outputs, layer_proofs=layer_proofs), levels


# --------------------------------------------------------------------------
# serialization (canonical BE layout, same conventions as
# zk_tpu.sumcheck.proof_to_bytes)
# --------------------------------------------------------------------------


def gkr_proof_to_bytes(field: Field, proof: GKRProof) -> bytes:
    from zk_tpu.sumcheck import proof_to_bytes

    out = bytearray()
    out += len(proof.outputs).to_bytes(4, "big")
    if (
        proof.outputs_bytes is not None
        and len(proof.outputs_bytes) == len(proof.outputs) * field.n_bytes
    ):
        out += proof.outputs_bytes
    else:
        out += field.elements_to_bytes(proof.outputs)
    out += len(proof.layer_proofs).to_bytes(4, "big")
    for lp in proof.layer_proofs:
        sc = proof_to_bytes(field, lp.sumcheck)
        out += len(sc).to_bytes(4, "big")
        out += sc
        out += field.elements_to_bytes([lp.w_b, lp.w_c])
        out += len(lp.q_evals).to_bytes(4, "big")
        out += field.elements_to_bytes(lp.q_evals)
    return bytes(out)


def gkr_proof_from_bytes(field: Field, data: bytes) -> GKRProof:
    from zk_tpu.sumcheck import proof_from_bytes

    nb = field.n_bytes
    off = 0

    def u32() -> int:
        nonlocal off
        v = int.from_bytes(data[off : off + 4], "big")
        off += 4
        return v

    def elems(count: int) -> list[int]:
        nonlocal off
        out = [
            field.from_be_bytes_mod_order(data[off + i * nb : off + (i + 1) * nb])
            for i in range(count)
        ]
        off += count * nb
        return out

    n_out = u32()
    ob_start = off
    outputs = elems(n_out)
    outputs_bytes = data[ob_start : ob_start + n_out * nb]
    layer_proofs = []
    for _ in range(u32()):
        sc_len = u32()
        sc = proof_from_bytes(field, data[off : off + sc_len])
        off += sc_len
        w_b, w_c = elems(2)
        q_evals = elems(u32())
        layer_proofs.append(
            LayerProof(sumcheck=sc, w_b=w_b, w_c=w_c, q_evals=q_evals)
        )
    if off != len(data):
        raise ValueError("trailing bytes in serialized GKR proof")
    return GKRProof(
        outputs=outputs, layer_proofs=layer_proofs, outputs_bytes=outputs_bytes
    )


# --------------------------------------------------------------------------
# verifier
# --------------------------------------------------------------------------


class GKRVerifier:
    @staticmethod
    def verify(
        field: Field, circuit: Circuit, inputs: list[int], proof: GKRProof
    ) -> bool:
        """Verify a GKR proof against the circuit + inputs.  Raises
        GKRError / SumcheckError on malformed proofs; returns False on a
        final-claim mismatch (mirroring the sumcheck error semantics)."""
        if len(proof.layer_proofs) != circuit.depth:
            raise GKRError("invalid proof: require one layer proof per circuit layer")

        # Canonical output bytes: reuse the proof's cache when present
        # (attached by the prover / the deserializer) — recomputing is a
        # 2^19-iteration int.to_bytes loop at the bench scale.  The
        # transcript binds these exact bytes (the standard FS rule:
        # absorb what was received); for canonical encodings this is
        # byte-identical to elements_to_bytes(outputs).
        out_bytes = proof.outputs_bytes
        if out_bytes is None or len(out_bytes) != len(proof.outputs) * field.n_bytes:
            out_bytes = field.elements_to_bytes(proof.outputs)

        pad_n = 1 << circuit.layer_k(0)
        big_out = pad_n > 4096
        if big_out:
            from zk_tpu.gkr import device as gdev

            # start the output-table upload BEFORE the host keccak
            # absorb: the device transfer is async, so the ~16 MB upload
            # overlaps the ~0.2 s host hashing below.  The encoded table
            # is cached on the proof (keyed by shape; a pure function of
            # out_bytes, which the dataclass owns) so re-verifying the
            # same proof pays the upload once.
            cached = proof._out_dev
            if (
                isinstance(cached, tuple)
                and cached[0] == (field.name, pad_n)
                and cached[1] is not None
            ):
                out_dev = cached[1]
            else:
                out_dev = dev.encode_bytes_be(
                    field,
                    out_bytes
                    + b"\x00" * ((pad_n - len(proof.outputs)) * field.n_bytes),
                )
                proof._out_dev = ((field.name, pad_n), out_dev)

        transcript = Transcript()
        transcript.append(out_bytes)
        r = transcript.sample_n_field_elements(field, circuit.layer_k(0))
        if big_out:
            m = dev.decode_ints(field, gdev.mle_eval_points(field, out_dev, [r]))[0]
        else:
            padded_out = proof.outputs + [0] * (pad_n - len(proof.outputs))
            m = mle_eval_host(field, padded_out, r)

        # per-layer oracle checks run on device; their decodes batch into
        # ONE sync after the (host, serial) transcript loop — the oracle
        # values feed only the checks, never the Fiat-Shamir chain
        deferred: list[tuple[int, object, int, int, int]] = []
        for i, lp in enumerate(proof.layer_proofs):
            k_in = circuit.layer_k(i + 1)
            if len(lp.sumcheck.round_polys) != 2 * k_in:
                raise GKRError("invalid layer proof: wrong sumcheck round count")
            if lp.sumcheck.sum % field.p != m:
                raise GKRError("layer claim does not match running claim")

            subclaim = SumcheckVerifier._verify_internal(
                field, lp.sumcheck, transcript
            )
            b_star = subclaim.challenges[:k_in]
            c_star = subclaim.challenges[k_in:]
            transcript.append(field.elements_to_bytes([lp.w_b, lp.w_c]))

            # oracle check of the layer polynomial at (b*, c*) — device
            # eq-gather kernel for big layers (decode deferred to one
            # batched sync), host eq-sum for small ones
            if len(circuit.layers[i]) > 256:
                from zk_tpu.gkr import device as gdev

                handle = gdev.wiring_eval_async(field, circuit, i, r, b_star, c_star)
                deferred.append((i, handle, lp.w_b, lp.w_c, subclaim.sum))
            else:
                add_e = _wiring_eval_host(field, circuit, i, ADD, r + b_star + c_star)
                mul_e = _wiring_eval_host(field, circuit, i, "mul", r + b_star + c_star)
                expect = field.add(
                    field.mul(add_e, field.add(lp.w_b, lp.w_c)),
                    field.mul(mul_e, field.mul(lp.w_b, lp.w_c)),
                )
                if expect != subclaim.sum:
                    raise GKRError("layer oracle check failed")

            # line-restriction consistency + claim reduction
            if len(lp.q_evals) != k_in + 1:
                raise GKRError("invalid layer proof: wrong q eval count")
            if lp.q_evals[0] % field.p != lp.w_b or (
                k_in >= 1 and lp.q_evals[1] % field.p != lp.w_c
            ):
                raise GKRError("line restriction inconsistent with claimed w values")
            transcript.append(field.elements_to_bytes(lp.q_evals))

            r_star = transcript.sample_field_element(field)
            r = [(b + r_star * (c - b)) % field.p for b, c in zip(b_star, c_star)]
            q = UnivariatePolynomial.interpolate(field, lp.q_evals)
            m = q.evaluate(r_star)

        # final oracle check against the input MLE (device fold for big
        # input vectors — incl. device-resident inputs — exact host ints
        # for small ones); enqueued before the deferred-oracle sync so
        # one device drain covers both
        pad_to = 1 << circuit.layer_k(circuit.depth)
        got_handle = None
        if isinstance(inputs, jnp.ndarray):
            from zk_tpu.gkr import device as gdev

            data = inputs
            if pad_to > data.shape[-1]:
                data = jnp.pad(data, ((0, 0), (0, pad_to - data.shape[-1])))
            got_handle = gdev.mle_eval_points(field, data, [r])
        else:
            padded_inputs = [v % field.p for v in inputs] + [0] * (
                pad_to - len(inputs)
            )
            if len(padded_inputs) > 4096:
                from zk_tpu.gkr import device as gdev

                got_handle = gdev.mle_eval_points(
                    field, dev.encode_ints(field, padded_inputs), [r]
                )

        # ONE device_get covers every deferred oracle value + the final
        # input evaluation (each separate decode would pay a ~26 ms RTT)
        handles = [h for _, h, _, _, _ in deferred]
        if got_handle is not None:
            handles.append(got_handle)
        fetched = jax.device_get(handles) if handles else []

        for (i, _h, w_b, w_c, claimed), arr in zip(deferred, fetched):
            vals = dev.decode_ints(field, arr)
            add_e, mul_e = vals[0], vals[1]
            expect = field.add(
                field.mul(add_e, field.add(w_b, w_c)),
                field.mul(mul_e, field.mul(w_b, w_c)),
            )
            if expect != claimed:
                raise GKRError("layer oracle check failed")

        if got_handle is not None:
            return dev.decode_ints(field, fetched[-1])[0] == m
        return mle_eval_host(field, padded_inputs, r) == m
