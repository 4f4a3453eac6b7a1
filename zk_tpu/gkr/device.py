"""Device tier for GKR: wiring tables, eq expansion, and the linear-time
(Libra-style) two-phase layer decomposition.

The dense formulation in zk_tpu.gkr builds (b, c) factor tables of size
4^k per layer.  This module implements the standard linear-time GKR
prover algorithm (Xie et al., "Libra"): the layer sum

  sum_{b,c} add~(r,b,c) * (W(b) + W(c)) + mul~(r,b,c) * W(b) * W(c)

is proven as two chained k-round sumchecks whose factor tables have size
2^k and are built from the sparse wiring in O(gates) device scatters:

  phase 1 (sum over b):   G1(b) * W(b) + A2(b)
      G1(b) = sum_c add~(r,b,c) + sum_c mul~(r,b,c) W(c)
      A2(b) = sum_c add~(r,b,c) W(c)
  phase 2 (sum over c, b fixed at u):
      add_u(c) * (W(u) + W(c)) + mul_u(c) * W(u) * W(c)
      add_u(c) = add~(r,u,c),  mul_u(c) = mul~(r,u,c)

Because a sumcheck round polynomial is the sum of the full polynomial
over the remaining variables, the 2k round polynomials are *identical*
to the dense path's — same Fiat-Shamir bytes, same proofs (differential
test: tests/test_gkr.py) — only the prover cost drops from O(4^k) to
O(2^k + gates) per layer.

Everything here operates on (L, N) Montgomery limb tensors from
zk_tpu.fields.device; scatters accumulate raw uint32 limb sums and are
renormalized once per table (dev.renorm_relaxed), exact for up to 2^16
gates sharing a wire.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from zk_tpu.fields import device as dev
from zk_tpu.fields.field import Field
from zk_tpu.poly import MLE, ProductPoly, SumOfProducts
from zk_tpu.poly.mle import _fold_kernel

U32 = jnp.uint32


# --------------------------------------------------------------------------
# eq table + batched point evaluation
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 1))
def _eq_expand(field: Field, k: int, rs):
    """rs: (k, L) Montgomery scalars -> (L, 2^k) table of
    eq(r, a) = prod_j (r_j a_j + (1-r_j)(1-a_j)), var 0 = index MSB
    (the polynomial layer's convention).  Iterated doubling: process
    variables LSB-first so each step prepends the next-more-significant
    bit — k steps, 2^k total Montgomery multiplies."""
    L = field.n_limbs
    x = jnp.asarray(dev.const_limbs(field, 1)).reshape(L, 1)
    for j in range(k - 1, -1, -1):
        r = rs[j].reshape(L, 1)
        right = dev.mont_mul(field, x, r)
        left = dev.sub_mod(field, x, right)
        x = jnp.concatenate([left, right], axis=-1)
    return x


def _mont_rs(field: Field, point: list[int]) -> jnp.ndarray:
    """Host ints -> (k, L) Montgomery scalar rows (single upload)."""
    k = len(point)
    out = np.empty((k, field.n_limbs), dtype=np.uint32)
    for j, v in enumerate(point):
        out[j] = dev.const_limbs(field, v)
    return jnp.asarray(out)


def eq_table(field: Field, point: list[int]) -> jnp.ndarray:
    """eq(point, .) over the 2^k hypercube as (L, 2^k) Montgomery limbs."""
    if not point:
        return jnp.asarray(dev.const_limbs(field, 1)).reshape(field.n_limbs, 1)
    return _eq_expand(field, len(point), _mont_rs(field, point))


@functools.partial(jax.jit, static_argnums=(0, 1))
def _eval_points_kernel(field: Field, n_vars: int, data, rs):
    """data: (L, 2^n) table; rs: (P, n_vars, L) Montgomery fold scalars.
    Returns (L, P) Montgomery evaluations — P full folds batched in one
    dispatch (vmap over the reference fold chain)."""
    out = jax.vmap(lambda r: _fold_kernel(field, n_vars, 0, n_vars, data, r))(rs)
    return out[:, :, 0].T  # (P, L, 1) -> (L, P)


def mle_eval_points(field: Field, data: jnp.ndarray, points: list[list[int]]):
    """Evaluate one MLE table at many points; returns (L, P) device limbs
    (decode with dev.decode_ints for host ints).

    On TPU with a large table, each point runs the in-place capacity
    fold chain (async dispatches, ~4 vars per HBM pass) instead of the
    vmapped jnp ladder — the P chains pipeline back-to-back.  (The
    vmapped ladder was measured STRICTLY worse on the v5e for many
    points: 1.4 s warm / 203 s compile for 21 points at 2^20 vs 0.6 s
    for the chains; GKR's many-point case uses line_restriction_evals
    instead, which needs only one symbolic fold pass.)"""
    from zk_tpu.fields.pallas_kernels import on_tpu
    from zk_tpu.poly.mle import _fold_var0_fast

    n_vars = (data.shape[-1]).bit_length() - 1
    if n_vars == 0:
        return jnp.tile(data.reshape(field.n_limbs, 1), (1, len(points)))
    if on_tpu() and data.shape[-1] >= 4096:
        outs = [_fold_var0_fast(field, data, list(pt)) for pt in points]
        if all(o is not None for o in outs):
            return jnp.concatenate(outs, axis=1)  # (L, P)
    P = len(points)
    rs = np.empty((P, n_vars, field.n_limbs), dtype=np.uint32)
    for i, pt in enumerate(points):
        for j, v in enumerate(pt):
            rs[i, j] = dev.const_limbs(field, v)
    return _eval_points_kernel(field, n_vars, data, jnp.asarray(rs))


# --------------------------------------------------------------------------
# line restriction: q(t) = W~(b + t(c - b)) in ONE symbolic fold pass
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 1))
def _line_fold_kernel(field: Field, k: int, data, bs, ds):
    """Restrict a (L, 2^k) MLE table to the line l(t) = b + t*(c - b):
    returns the (L, k+1) COEFFICIENTS of the degree-<=k univariate
    q(t) = W~(l(t)).

    Each fold level substitutes the linear polynomial l_j(t) = b_j +
    t*d_j for variable j, so table entries become polynomials in t
    (degree axis last): new = left + l_j(t) * (right - left), i.e.
    new_d = left_d + b_j*diff_d + d_j*diff_{d-1} — two Montgomery mults
    per coefficient.  Total work ~4*2^k field mults, vs ~(k+1)*2^k for
    evaluating W~ at the k+1 line points separately (the round-3
    design: ~130 chained fold dispatches per GKR layer).  Same pairing
    order as the evaluation fold (var 0 = MSB), so values are identical
    to per-point evaluation."""
    L = field.n_limbs
    x = data[:, :, None]  # (L, N, 1): degree-0 coefficients
    n = 1 << k
    for j in range(k):
        half = n // 2
        left, right = x[:, :half, :], x[:, half:, :]
        diff = dev.sub_mod(field, right, left)
        b_j = bs[j].reshape(L, 1, 1)
        d_j = ds[j].reshape(L, 1, 1)
        t0 = dev.add_mod(field, left, dev.mont_mul(field, diff, b_j))
        t1 = dev.mont_mul(field, diff, d_j)
        x = dev.add_mod(
            field,
            jnp.pad(t0, ((0, 0), (0, 0), (0, 1))),
            jnp.pad(t1, ((0, 0), (0, 0), (1, 0))),
        )
        n = half
    return x[:, 0, :]  # (L, k+1)


def line_restriction_evals(
    field: Field, w_dev: jnp.ndarray, b: list[int], c: list[int]
) -> list[int]:
    """q(t) = W~(b + t(c - b)) evaluated at t = 0..k (the GKR layer
    proof's q_evals; q(0) = W(b*), q(1) = W(c*)).  One device dispatch
    for the symbolic fold + one small decode; the t-point evaluations
    are k+1 Horner chains on host ints (O(k^2) bigint mults)."""
    k = len(b)
    if k == 0:
        v = dev.decode_ints(field, w_dev.reshape(field.n_limbs, 1))[0]
        return [v]
    ds = [(cj - bj) % field.p for bj, cj in zip(b, c)]
    coeffs = _line_fold_kernel(
        field, k, w_dev, _mont_rs(field, b), _mont_rs(field, ds)
    )
    cs = dev.decode_ints(field, coeffs)  # degree 0..k
    out = []
    for t in range(k + 1):
        acc = 0
        for d in range(k, -1, -1):
            acc = (acc * t + cs[d]) % field.p
        out.append(acc)
    return out


# --------------------------------------------------------------------------
# device circuit evaluation (witness generation)
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 1))
def _layer_eval(field: Field, pad_to: int, cur, left_idx, right_idx, is_add):
    """One circuit layer on device: gather children, add/mul mod p,
    select by gate op, zero-pad the output vector to 2^k."""
    lv = cur[:, left_idx]
    rv = cur[:, right_idx]
    vals = jnp.where(
        is_add[None, :], dev.add_mod(field, lv, rv), dev.mont_mul(field, lv, rv)
    )
    n = vals.shape[-1]
    if pad_to > n:
        vals = jnp.pad(vals, ((0, 0), (0, pad_to - n)))
    return vals


@functools.lru_cache(maxsize=None)
def _sharded_layer_fn(field: Field, mesh):
    """Cached jitted shard_map layer evaluator for one (field, mesh):
    gate wiring is sharded along the gate/output axis, the lower level is
    replicated, so each device gathers and computes only its gate shard
    with plain local ops; out_specs re-replicates the result for the next
    layer's gathers (one all-gather per layer over the mesh)."""
    from jax.sharding import PartitionSpec as P

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("x"), P("x"), P("x"), P("x")),
        out_specs=P(None, "x"),
    )
    def f(cur, left_idx, right_idx, is_add, valid):
        lv = cur[:, left_idx]
        rv = cur[:, right_idx]
        vals = jnp.where(
            is_add[None, :], dev.add_mod(field, lv, rv), dev.mont_mul(field, lv, rv)
        )
        return jnp.where(valid[None, :], vals, jnp.zeros_like(vals))

    return f


def _layer_eval_sharded(field: Field, mesh, pad_to: int, cur, circuit, layer: int):
    """One circuit layer over the mesh: wiring padded to the 2^k output
    width and sharded on the gate axis; padded slots compute garbage that
    the validity mask zeroes (matching _layer_eval's zero padding).  The
    padded sharded wiring uploads once per (circuit, mesh, layer) and is
    cached on the circuit (see Circuit.device_wiring)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    cur = jax.device_put(cur, NamedSharding(mesh, P()))  # replicate lower level
    key = ("sharded_wiring", layer, mesh)
    wired = circuit._dev_cache.get(key)
    if wired is None:
        left, right, is_add, _, _ = circuit.wiring(layer)
        n = len(left)
        shard = NamedSharding(mesh, P("x"))
        lp = np.zeros(pad_to, dtype=np.int32)
        rp = np.zeros(pad_to, dtype=np.int32)
        ap = np.zeros(pad_to, dtype=bool)
        vp = np.zeros(pad_to, dtype=bool)
        lp[:n], rp[:n], ap[:n], vp[:n] = left, right, is_add, True
        wired = tuple(
            jax.device_put(jnp.asarray(x), shard) for x in (lp, rp, ap, vp)
        )
        circuit._dev_cache[key] = wired
    out = _sharded_layer_fn(field, mesh)(cur, *wired)
    # re-replicate for the next layer's (arbitrary-wiring) gathers —
    # the one all-gather per layer this evaluation strategy pays
    return jax.device_put(out, NamedSharding(mesh, P()))


def evaluate_device(circuit, field: Field, inputs, mesh=None) -> list[jnp.ndarray]:
    """Wire values per level as (L, 2^k) Montgomery tensors, output level
    first (device analog of Circuit.evaluate — same padding, gkr/circuit.py).

    `inputs` is a list of host ints OR an already-encoded (L, n_inputs)
    Montgomery limb tensor (the production path: a device-resident
    witness never crosses the host link — on the axon tunnel a
    2^19-element BLS witness upload alone costs ~0.5 s).

    With a mesh, layers whose padded width divides across the mesh run
    gate-sharded under GSPMD (one all-gather per layer to re-replicate
    the wire vector for the next layer's gathers); values are identical
    to the single-device path."""
    pad_to = 1 << circuit.layer_k(circuit.depth)
    if isinstance(inputs, jax.Array):
        if inputs.shape != (field.n_limbs, circuit.n_inputs):
            raise ValueError(
                f"device inputs must be ({field.n_limbs}, {circuit.n_inputs}) "
                f"Montgomery limbs, got {inputs.shape}"
            )
        cur = inputs
        if pad_to > circuit.n_inputs:
            cur = jnp.pad(cur, ((0, 0), (0, pad_to - circuit.n_inputs)))
    else:
        if len(inputs) != circuit.n_inputs:
            raise ValueError("wrong number of inputs")
        padded = [v for v in inputs] + [0] * (pad_to - len(inputs))
        cur = dev.encode_ints(field, padded)
    levels: list = [None] * (circuit.depth + 1)
    levels[circuit.depth] = cur
    for i in range(circuit.depth - 1, -1, -1):
        pad_to = 1 << circuit.layer_k(i)
        if mesh is not None and pad_to % mesh.devices.size == 0:
            cur = _layer_eval_sharded(field, mesh, pad_to, cur, circuit, i)
        else:
            cur = _layer_eval(field, pad_to, cur, *circuit.device_wiring(i))
        levels[i] = cur
    return levels


# --------------------------------------------------------------------------
# Libra phase tables
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 1))
def _scatter_table(field: Field, size: int, pos, vals):
    """Scatter-add Montgomery values into a zeroed (L, size) table and
    renormalize mod p (duplicate positions accumulate exactly).

    The scatter runs in (size, L) ROW-major layout: each gate moves one
    contiguous 4L-byte row instead of L strided lanes — measured ~2x
    faster on the v5e (47 ms vs 82 ms for 2^19 BLS12-381 scatters);
    the transposes fuse into streaming HBM passes."""
    acc = jnp.zeros((size, field.n_limbs), U32).at[pos].add(vals.T)
    return dev.renorm_relaxed(field, acc.T)


@functools.partial(jax.jit, static_argnums=0)
def _gather_table(field: Field, perms, vals):
    """Scatter-add expressed as fan-in gathers: vals (L, G) Montgomery
    values, perms (S, size) from Circuit.gather_plan (dummy index G
    selects the appended zero column).  Raw uint32 limb accumulation
    then one renorm — integer-identical to _scatter_table, but each of
    the S rows is a streaming gather instead of a serialized TPU
    scatter (~1-2 ms vs ~47 ms at 2^19 BLS rows)."""
    L = vals.shape[0]
    ext = jnp.concatenate([vals, jnp.zeros((L, 1), U32)], axis=1)
    acc = ext[:, perms[0]]
    for s in range(1, perms.shape[0]):
        acc = acc + ext[:, perms[s]]
    return dev.renorm_relaxed(field, acc)


# above this max fan-in the gather decomposition's S streaming passes
# lose to one serialized scatter
_GATHER_FANIN_MAX = 64


@functools.partial(jax.jit, static_argnums=(0, 1))
def _phase1_tables_g(field: Field, size_in: int, eq_r, w_dev, right, is_add, perms_l):
    """Gather-plan variant of _phase1_tables (values identical)."""
    wgt = eq_r
    wr = w_dev[:, right]
    wgt_wr = dev.mont_mul(field, wgt, wr)
    g1_vals = jnp.where(is_add[None, :], wgt, wgt_wr)
    g1 = _gather_table(field, perms_l, g1_vals)
    a2_vals = jnp.where(is_add[None, :], wgt_wr, jnp.zeros_like(wgt_wr))
    a2 = _gather_table(field, perms_l, a2_vals)
    return g1, a2


@functools.partial(jax.jit, static_argnums=(0, 1))
def _phase2_tables_g(
    field: Field, size_in: int, eq_r, eq_u, w_dev, wu, left, is_add, perms_r
):
    """Gather-plan variant of _phase2_tables (values identical)."""
    gl = eq_u[:, left]
    w2 = dev.mont_mul(field, eq_r, gl)
    zeros = jnp.zeros_like(w2)
    add_u = _gather_table(field, perms_r, jnp.where(is_add[None, :], w2, zeros))
    mul_u = _gather_table(field, perms_r, jnp.where(is_add[None, :], zeros, w2))
    mul_u_s = dev.mont_mul(field, mul_u, wu)
    w_shift = dev.add_mod(field, w_dev, wu)
    return add_u, mul_u_s, w_shift


@functools.partial(jax.jit, static_argnums=(0, 1))
def _phase1_tables(field: Field, size_in: int, eq_r, w_dev, left, right, is_add):
    """(G1, A2) for phase 1, each (L, size_in).

    G1 = scatter at b=left of [eq_r(a)            for add gates,
                               eq_r(a) * W(right) for mul gates]
    A2 = scatter at b=left of  eq_r(a) * W(right) for add gates only.
    """
    wgt = eq_r  # (L, G) — caller pre-slices to the gate count
    wr = w_dev[:, right]
    wgt_wr = dev.mont_mul(field, wgt, wr)
    g1_vals = jnp.where(is_add[None, :], wgt, wgt_wr)
    g1 = _scatter_table(field, size_in, left, g1_vals)
    a2_vals = jnp.where(is_add[None, :], wgt_wr, jnp.zeros_like(wgt_wr))
    a2 = _scatter_table(field, size_in, left, a2_vals)
    return g1, a2


@functools.partial(jax.jit, static_argnums=(0, 1))
def _phase2_tables(field: Field, size_in: int, eq_r, eq_u, w_dev, wu, left, right, is_add):
    """(add_u, mul_u_scaled, w_shift) for phase 2, each (L, size_in).

    add_u(c) = add~(r,u,c) = scatter at c=right of eq_r(a) * eq_u(left)
    mul_u_scaled = mul~(r,u,c) * W(u)
    w_shift(c) = W(u) + W(c)
    """
    gl = eq_u[:, left]
    w2 = dev.mont_mul(field, eq_r, gl)  # (L, G)
    zeros = jnp.zeros_like(w2)
    add_u = _scatter_table(
        field, size_in, right, jnp.where(is_add[None, :], w2, zeros)
    )
    mul_u = _scatter_table(
        field, size_in, right, jnp.where(is_add[None, :], zeros, w2)
    )
    mul_u_s = dev.mont_mul(field, mul_u, wu)
    w_shift = dev.add_mod(field, w_dev, wu)
    return add_u, mul_u_s, w_shift


def phase1_tables_auto(field: Field, circuit, layer: int, eq_r, w_dev):
    """(G1, A2) via the gather plan when fan-in permits, scatter otherwise."""
    n_gates = circuit.layer_size(layer)
    k_in = circuit.layer_k(layer + 1)
    left_d, right_d, is_add_d = circuit.device_wiring(layer)
    if circuit.gather_plan(layer, "left").shape[0] <= _GATHER_FANIN_MAX:
        return _phase1_tables_g(
            field,
            1 << k_in,
            eq_r[:, :n_gates],
            w_dev,
            right_d,
            is_add_d,
            circuit.device_gather_plan(layer, "left"),
        )
    return _phase1_tables(
        field, 1 << k_in, eq_r[:, :n_gates], w_dev, left_d, right_d, is_add_d
    )


def phase2_tables_auto(field: Field, circuit, layer: int, eq_r, eq_u, w_dev, wu):
    """(add_u, mul_u*W(u), W(u)+W) via gather plan or scatter."""
    n_gates = circuit.layer_size(layer)
    k_in = circuit.layer_k(layer + 1)
    left_d, right_d, is_add_d = circuit.device_wiring(layer)
    if circuit.gather_plan(layer, "right").shape[0] <= _GATHER_FANIN_MAX:
        return _phase2_tables_g(
            field,
            1 << k_in,
            eq_r[:, :n_gates],
            eq_u,
            w_dev,
            wu,
            left_d,
            is_add_d,
            circuit.device_gather_plan(layer, "right"),
        )
    return _phase2_tables(
        field,
        1 << k_in,
        eq_r[:, :n_gates],
        eq_u,
        w_dev,
        wu,
        left_d,
        right_d,
        is_add_d,
    )


def build_phase1(field: Field, circuit, layer: int, eq_r, w_dev) -> SumOfProducts:
    """Phase-1 polynomial over b: G1(b)*W(b) + A2(b)."""
    k_in = circuit.layer_k(layer + 1)
    g1, a2 = phase1_tables_auto(field, circuit, layer, eq_r, w_dev)
    w = MLE(field, k_in, w_dev)
    return SumOfProducts(
        [ProductPoly([MLE(field, k_in, g1), w]), ProductPoly([MLE(field, k_in, a2)])]
    )


def build_phase2(
    field: Field, circuit, layer: int, eq_r, u: list[int], w_dev
) -> tuple[SumOfProducts, jnp.ndarray]:
    """Phase-2 polynomial over c (b fixed at u):
    add_u(c)*(W(u)+W(c)) + [mul_u(c)*W(u)]*W(c).  Also returns W(u) as a
    (L, 1) device scalar (the layer proof's w_b, decoded later)."""
    k_in = circuit.layer_k(layer + 1)
    wu = mle_eval_points(field, w_dev, [u])  # (L, 1)
    add_u, mul_u_s, w_shift = phase2_tables_auto(
        field, circuit, layer, eq_r, eq_table(field, u), w_dev, wu
    )
    poly = SumOfProducts(
        [
            ProductPoly([MLE(field, k_in, add_u), MLE(field, k_in, w_shift)]),
            ProductPoly([MLE(field, k_in, mul_u_s), MLE(field, k_in, w_dev)]),
        ]
    )
    return poly, wu


# --------------------------------------------------------------------------
# device wiring-predicate evaluation (verifier-side option)
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=0)
def _wiring_eval_kernel(field: Field, eq_r, eq_b, eq_c, left, right, is_add):
    """(add~, mul~) at (r, b, c) from the gate list: per gate
    eq_r(a) * eq_b(left) * eq_c(right), summed per op.  Returns (L, 2)."""
    w = dev.mont_mul(field, eq_r, eq_b[:, left])
    w = dev.mont_mul(field, w, eq_c[:, right])
    mask = is_add[None, :]
    add_sum = dev.sum_mod(field, jnp.where(mask, w, jnp.zeros_like(w)), axis=-1)
    mul_sum = dev.sum_mod(field, jnp.where(mask, jnp.zeros_like(w), w), axis=-1)
    return jnp.stack([add_sum, mul_sum], axis=-1)


def wiring_eval_async(
    field: Field, circuit, layer: int, r: list[int], b: list[int], c: list[int]
) -> jnp.ndarray:
    """Enqueue the (add~, mul~) evaluation at (r, b, c); returns the
    (L, 2) device handle WITHOUT syncing — the GKR verifier batches all
    layers' oracle values into one device_get (the per-layer ~26 ms
    readback RTTs were a top warm-verify cost)."""
    n_gates = circuit.layer_size(layer)
    return _wiring_eval_kernel(
        field,
        eq_table(field, r)[:, :n_gates],
        eq_table(field, b),
        eq_table(field, c),
        *circuit.device_wiring(layer),
    )


def wiring_eval(
    field: Field, circuit, layer: int, r: list[int], b: list[int], c: list[int]
) -> tuple[int, int]:
    """Evaluate (add~_layer, mul~_layer) at (r, b, c) on device in
    O(gates) — same values as the host eq-sum (gkr._wiring_eval_host)."""
    vals = dev.decode_ints(field, wiring_eval_async(field, circuit, layer, r, b, c))
    return vals[0], vals[1]
