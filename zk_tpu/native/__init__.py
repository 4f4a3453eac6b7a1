"""Native (C) runtime pieces, loaded via ctypes.

Currently: the Keccak-256 transcript hasher (keccak.c), built on first
import with the system compiler into _zk_native.so next to the sources.
If no toolchain is available the import raises and callers fall back to
the pure-Python tier (zk_tpu/transcript/keccak.py) — same bytes either
way, differential-tested in tests/test_native_keccak.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_zk_native.so")
_SRC = os.path.join(_DIR, "keccak.c")
_LOCK = threading.Lock()
_LIB = None


def _build() -> None:
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O3", "-shared", "-fPIC", "-o", _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.zk_keccak_new.restype = ctypes.c_void_p
        lib.zk_keccak_free.argtypes = [ctypes.c_void_p]
        lib.zk_keccak_reset.argtypes = [ctypes.c_void_p]
        lib.zk_keccak_update.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_size_t,
        ]
        lib.zk_keccak_digest.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.zk_keccak_finalize_reset.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.zk_keccak_export.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.zk_keccak_import.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_size_t,
        ]
        _LIB = lib
        return lib


class NativeKeccak256:
    """Drop-in for zk_tpu.transcript.keccak.Keccak256 (C implementation)."""

    digest_size = 32

    def __init__(self):
        self._lib = _load()
        self._ctx = self._lib.zk_keccak_new()
        if not self._ctx:
            raise MemoryError("keccak ctx allocation failed")

    def __del__(self):
        lib = getattr(self, "_lib", None)
        ctx = getattr(self, "_ctx", None)
        if lib is not None and ctx:
            lib.zk_keccak_free(ctx)
            self._ctx = None

    def update(self, data: bytes) -> "NativeKeccak256":
        self._lib.zk_keccak_update(self._ctx, data, len(data))
        return self

    def digest(self) -> bytes:
        out = ctypes.create_string_buffer(32)
        self._lib.zk_keccak_digest(self._ctx, out)
        return out.raw

    def finalize_reset(self) -> bytes:
        out = ctypes.create_string_buffer(32)
        self._lib.zk_keccak_finalize_reset(self._ctx, out)
        return out.raw

    def export_state(self) -> tuple[list[int], bytes]:
        """(25 lanes as ints, pending buffered bytes) — for migrating the
        sponge to the device-resident transcript mid-proof."""
        lanes = ctypes.create_string_buffer(200)
        buf = ctypes.create_string_buffer(136)
        n = ctypes.c_size_t(0)
        self._lib.zk_keccak_export(self._ctx, lanes, buf, ctypes.byref(n))
        raw = lanes.raw
        return (
            [int.from_bytes(raw[8 * i : 8 * i + 8], "little") for i in range(25)],
            buf.raw[: n.value],
        )

    def import_state(self, lanes, buf: bytes) -> None:
        raw = b"".join(int(l).to_bytes(8, "little") for l in lanes)
        self._lib.zk_keccak_import(self._ctx, raw, bytes(buf), len(buf))


# build eagerly so `from zk_tpu.native import NativeKeccak256` fails fast
# (and the transcript falls back to Python) when no compiler exists
_load()
