"""Fiat-Shamir transcript — byte-exact reimplementation of the reference.

Semantics (transcript/src/lib.rs:5-34): a running Keccak-256 hasher;
``append`` absorbs bytes; a challenge is the 32-byte digest of everything
absorbed so far, after which the hasher is RESET and the digest itself is
re-absorbed (so successive challenges chain).  Challenge -> field element
via big-endian reduction mod p (``from_be_bytes_mod_order``).

Runs on host between device rounds; uses the C keccak backend from
``zk_tpu.native`` when available, pure Python otherwise.
"""

from __future__ import annotations

from zk_tpu.fields.field import Field

try:  # pragma: no cover - exercised when the native extension is built
    from zk_tpu.native import NativeKeccak256 as _Keccak256

    HAS_NATIVE = True
except Exception:  # pragma: no cover
    from zk_tpu.transcript.keccak import Keccak256 as _Keccak256

    HAS_NATIVE = False


class Transcript:
    """Running-hash Fiat-Shamir transcript (transcript/src/lib.rs:5-34)."""

    def __init__(self):
        self._hasher = _Keccak256()

    def append(self, data: bytes) -> None:
        self._hasher.update(data)

    def sample_challenge(self) -> bytes:
        """32-byte challenge: finalize_reset then re-absorb own output
        (transcript/src/lib.rs:20-25)."""
        digest = self._hasher.finalize_reset()
        self._hasher.update(digest)
        return digest

    def sample_field_element(self, field: Field) -> int:
        return field.from_be_bytes_mod_order(self.sample_challenge())

    def sample_n_field_elements(self, field: Field, n: int) -> list[int]:
        return [self.sample_field_element(field) for _ in range(n)]

    def export_state(self) -> tuple[list[int], bytes]:
        """(25 sponge lanes, pending buffered bytes) — hands the running
        hash to the device-resident transcript (zk_tpu.transcript.device)
        so the prover's Fiat-Shamir loop can stay on-device."""
        return self._hasher.export_state()

    def import_state(self, lanes, buf: bytes) -> None:
        """Resume from a state exported by the device-resident transcript
        (the host tail of a device-transcript proof)."""
        self._hasher.import_state(lanes, buf)
