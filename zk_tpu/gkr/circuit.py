"""Layered arithmetic circuits for GKR.

The reference snapshot's gkr crate is absent (readme.md:9 links it;
SURVEY.md §0) — this component is reconstructed from the PAZK protocol
spec (Thaler ch. 4) against the interface the reference's sumcheck crate
anticipates (SubClaim / prove_partial, sumcheck/src/lib.rs:13-20).

A circuit is a list of layers of fan-in-2 add/mul gates; layer 0 is the
output layer, each gate reads two wire indices from the layer below, and
the bottom layer reads the inputs.  Layer value vectors are padded to
powers of two so W_i extends to an MLE with var 0 = MSB (the convention
of the polynomial layer).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from zk_tpu.fields.field import Field

ADD = "add"
MUL = "mul"


@dataclass(frozen=True)
class Gate:
    op: str  # "add" | "mul"
    left: int  # wire index in the layer below
    right: int

    def __post_init__(self):
        if self.op not in (ADD, MUL):
            raise ValueError(f"unknown gate op {self.op!r}")


def _k_for(size: int) -> int:
    """Variable count for a layer of `size` wires (>= 1)."""
    if size <= 1:
        return 0
    return (size - 1).bit_length()


class _ArrayLayer:
    """A gate layer backed by numpy wiring arrays instead of Gate objects
    — sequence-compatible (len/index/iter materialize Gates lazily), so
    million-gate benchmark circuits skip per-gate Python construction."""

    __slots__ = ("left", "right", "is_add")

    def __init__(self, left: np.ndarray, right: np.ndarray, is_add: np.ndarray):
        self.left = np.asarray(left, dtype=np.int32)
        self.right = np.asarray(right, dtype=np.int32)
        self.is_add = np.asarray(is_add, dtype=bool)

    def __len__(self) -> int:
        return len(self.left)

    def __getitem__(self, a: int) -> Gate:
        return Gate(
            ADD if self.is_add[a] else MUL, int(self.left[a]), int(self.right[a])
        )

    def __iter__(self):
        for a in range(len(self)):
            yield self[a]


class Circuit:
    """Layered fan-in-2 arithmetic circuit.

    layers[0] is the output layer; gate children index into the next
    layer down (layers[i+1], or the inputs for the last layer).
    """

    @classmethod
    def from_arrays(
        cls, layers: list[tuple[np.ndarray, np.ndarray, np.ndarray]], n_inputs: int
    ) -> "Circuit":
        """Build from per-layer (left, right, is_add) numpy wiring arrays
        with vectorized validation — for circuits too large for per-gate
        Python objects (the device prover only ever touches the arrays).
        """
        obj = cls.__new__(cls)
        obj.layers = [_ArrayLayer(l, r, a) for l, r, a in layers]
        obj.n_inputs = n_inputs
        obj._wiring = {}
        obj._plans = {}
        obj._dev_cache = {}
        if not layers:
            raise ValueError("circuit must have at least one layer")
        if n_inputs < 1:
            raise ValueError("circuit must have at least one input")
        for i, layer in enumerate(obj.layers):
            below = len(obj.layers[i + 1]) if i + 1 < len(obj.layers) else n_inputs
            for arr in (layer.left, layer.right):
                if len(arr) and (arr.min() < 0 or arr.max() >= below):
                    raise ValueError(
                        f"layer {i} gate references wire outside layer below"
                    )
        return obj

    def __init__(self, layers: list[list[Gate]], n_inputs: int):
        if not layers:
            raise ValueError("circuit must have at least one layer")
        if n_inputs < 1:
            raise ValueError("circuit must have at least one input")
        self.layers = layers
        self.n_inputs = n_inputs
        self._wiring: dict[int, tuple] = {}
        self._plans: dict[tuple, np.ndarray] = {}
        self._dev_cache: dict[tuple, object] = {}
        # validate wiring
        for i, layer in enumerate(layers):
            below = len(layers[i + 1]) if i + 1 < len(layers) else n_inputs
            for g in layer:
                if not (0 <= g.left < below and 0 <= g.right < below):
                    raise ValueError(
                        f"layer {i} gate references wire outside layer below"
                    )

    @property
    def depth(self) -> int:
        return len(self.layers)

    def layer_size(self, i: int) -> int:
        """Wire count of level i, where level depth is the input layer."""
        if i == self.depth:
            return self.n_inputs
        return len(self.layers[i])

    def layer_k(self, i: int) -> int:
        """MLE variable count of level i (padded to power of two)."""
        return _k_for(self.layer_size(i))

    def wiring(self, i: int) -> tuple:
        """Cached numpy wiring arrays for layer i: (left, right, is_add,
        add_idx, mul_idx) — the gate list flattened for device gathers and
        scatters (gate a's output index is its list position a)."""
        cached = self._wiring.get(i)
        if cached is not None:
            return cached
        layer = self.layers[i]
        if isinstance(layer, _ArrayLayer):
            left, right, is_add = layer.left, layer.right, layer.is_add
        else:
            left = np.array([g.left for g in layer], dtype=np.int32)
            right = np.array([g.right for g in layer], dtype=np.int32)
            is_add = np.array([g.op == ADD for g in layer], dtype=bool)
        add_idx = np.nonzero(is_add)[0].astype(np.int32)
        mul_idx = np.nonzero(~is_add)[0].astype(np.int32)
        out = (left, right, is_add, add_idx, mul_idx)
        self._wiring[i] = out
        return out

    def gather_plan(self, i: int, which: str) -> np.ndarray:
        """Fan-in decomposition of layer i's scatter-add at the `which`
        ("left"/"right") child indices: an (S, 2^k_in) int32 matrix where
        row s holds, per output slot, the index of the s-th gate writing
        that slot (or n_gates for none — callers pad the value vector
        with a zero column).  S = max fan-in.  Summing the S gathered
        rows reproduces the scatter-add exactly (same integer limb sums,
        order-independent) — but gathers stream on the TPU (~1-2 ms for
        2^19 BLS rows) where the scatter op serializes (~47 ms).  Cached
        per (layer, side); built once on host in O(G log G)."""
        key = (i, which)
        cached = self._plans.get(key)
        if cached is not None:
            return cached
        left, right, *_ = self.wiring(i)
        pos = left if which == "left" else right
        size = 1 << self.layer_k(i + 1)
        n_gates = len(pos)
        order = np.argsort(pos, kind="stable").astype(np.int32)
        sp = pos[order]
        first = np.searchsorted(sp, sp, side="left")
        rank = np.arange(n_gates) - first
        fanin = int(rank.max()) + 1 if n_gates else 1
        perms = np.full((fanin, size), n_gates, dtype=np.int32)
        perms[rank, sp] = order
        self._plans[key] = perms
        return perms

    def device_wiring(self, i: int) -> tuple:
        """Device-resident wiring for layer i: (left, right, is_add) as
        jax arrays, uploaded ONCE per circuit and cached on the instance.

        The GKR prover/verifier build phase tables and layer evals from
        these arrays every prove; re-uploading the ~4.5 MB of wiring per
        table build over the axon tunnel (~34 MB/s) was the top warm
        GKR prove cost of round 4 (~0.13 s per build, ~0.6 s per
        2-layer prove)."""
        key = ("wiring", i)
        cached = self._dev_cache.get(key)
        if cached is None:
            import jax.numpy as jnp

            left, right, is_add, _, _ = self.wiring(i)
            cached = (jnp.asarray(left), jnp.asarray(right), jnp.asarray(is_add))
            self._dev_cache[key] = cached
        return cached

    def device_gather_plan(self, i: int, which: str):
        """gather_plan(i, which) uploaded once and cached (see
        device_wiring)."""
        key = ("plan", i, which)
        cached = self._dev_cache.get(key)
        if cached is None:
            import jax.numpy as jnp

            cached = jnp.asarray(self.gather_plan(i, which))
            self._dev_cache[key] = cached
        return cached

    def evaluate(self, field: Field, inputs: list[int]) -> list[list[int]]:
        """Wire values per level, output level first; each vector padded
        with zeros to 2^k.  w[depth] is the (padded) input vector."""
        if len(inputs) != self.n_inputs:
            raise ValueError("wrong number of inputs")
        levels = [None] * (self.depth + 1)
        cur = [v % field.p for v in inputs]
        levels[self.depth] = cur + [0] * ((1 << _k_for(len(cur))) - len(cur))
        for i in range(self.depth - 1, -1, -1):
            vals = []
            for g in self.layers[i]:
                a, b = cur[g.left], cur[g.right]
                vals.append(field.add(a, b) if g.op == ADD else field.mul(a, b))
            cur = vals
            levels[i] = vals + [0] * ((1 << _k_for(len(vals))) - len(vals))
        return levels

    def outputs(self, field: Field, inputs: list[int]) -> list[int]:
        return self.evaluate(field, inputs)[0][: len(self.layers[0])]
