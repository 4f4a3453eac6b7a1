"""2^26-element sharded sumcheck prove on the simulated 8-device mesh.

The north-star scaling target (BASELINE.json:5) calls for >= 2^26-entry
MLE tables sharded across chips.  Single-chip capacity kernels cap at
2^26 (relaxed-accumulator grid bound — capacity.py::MAX_SINGLE_CHIP,
with an explicit error routing larger tables here); this test proves a
full 2^26 Goldilocks sumcheck through ShardedSumcheckProver on the CPU
mesh — shard-local W-folds, one psum per round, gather-to-host tail —
and oracle-checks the subclaim.

~3 minutes of CPU mesh work: gated behind ZK_TPU_BIG=1 so the default
suite stays fast.  Run: ``ZK_TPU_BIG=1 python -m pytest
tests/test_sharded_2pow26.py``.
"""

import os

import pytest

import jax
import jax.numpy as jnp

from zk_tpu.fields import GOLDILOCKS as G
from zk_tpu.fields import device as dev
from zk_tpu.parallel import ShardedSumcheckProver
from zk_tpu.poly import MLE, ProductPoly
from zk_tpu.sumcheck import SumcheckVerifier

pytestmark = pytest.mark.skipif(
    os.environ.get("ZK_TPU_BIG") != "1",
    reason="~3 min of CPU-mesh work; set ZK_TPU_BIG=1 to run",
)


def test_sharded_prove_2pow26():
    n = 26
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = jax.make_mesh((8,), ("x",), devices=devices[:8])

    @jax.jit
    def make_table(key):
        bits = jax.random.bits(key, (G.n_limbs, 1 << n), dtype=jnp.uint32)
        limbs = bits & jnp.uint32(0xFFFF)
        # top limb < 2^15 keeps every value < 2^63 < p (canonical)
        return limbs.at[G.n_limbs - 1].set(
            limbs[G.n_limbs - 1] & jnp.uint32(0x7FFF)
        )

    poly = MLE(G, n, make_table(jax.random.key(1)))
    total = dev.decode_ints(G, dev.sum_mod(G, poly.data, -1).reshape(G.n_limbs, 1))[0]
    pp = ProductPoly([poly])

    proof, challenges = ShardedSumcheckProver.prove_partial(
        mesh, pp, total, max_var_degree=1
    )
    assert len(proof.round_polys) == n
    sub = SumcheckVerifier.verify_partial(G, proof)
    assert sub.challenges == challenges
    assert pp.evaluate(sub.challenges) == sub.sum
