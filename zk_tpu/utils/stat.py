"""Nested wall-clock scope timers, gated by the PERF_LOG env var.

Reimplements the reference stat crate's start_timer!/end_timer! macros
(stat/src/lib.rs:13-56): thread-local stack of (label, start), indented
begin/end prints, enabled only when PERF_LOG=true.  Prints go to stderr
(bench.py reserves stdout for the driver's single JSON line).  Plus an analytic
field-op counter — on TPU the op counts are deterministic functions of
(n, degree, k), so no wrapper field type (field-tracker) is needed
(SURVEY.md §5).
"""

from __future__ import annotations

import os
import sys
import threading
import time
from contextlib import contextmanager

_STATE = threading.local()


def _enabled() -> bool:
    return os.environ.get("PERF_LOG") == "true"


def _stack():
    if not hasattr(_STATE, "blocks"):
        _STATE.blocks = []
    return _STATE.blocks


def start_timer(label: str) -> None:
    """stat/src/lib.rs:13-30."""
    if not _enabled():
        return
    blocks = _stack()
    indent = " " * len(blocks)
    blocks.append((label, time.perf_counter()))
    print(f"\n{indent}{label} (begin)", file=sys.stderr, flush=True)


def end_timer() -> None:
    """stat/src/lib.rs:34-56."""
    if not _enabled():
        return
    blocks = _stack()
    label, start = blocks.pop()
    indent = " " * len(blocks)
    elapsed = time.perf_counter() - start
    print(
        f"{indent}{label} (end): {elapsed * 1e3:.3f}ms\n",
        file=sys.stderr,
        flush=True,
    )


@contextmanager
def timer(label: str):
    start_timer(label)
    try:
        yield
    finally:
        end_timer()


# ------------------------------------------------------------- op counting


def mle_eval_mults(n_vars: int) -> int:
    """Field mults for a full n-var MLE evaluation: one per index pair
    (evaluation_form.rs:68) summed over the shrinking fold."""
    return (1 << n_vars) - 1


def sumcheck_prover_mults(n_vars: int, degree: int, k: int) -> int:
    """Field mults for the sumcheck prover round loop (prover.rs:44-68):
    per round on a size-s table, (degree-1) speculative lerp folds (the
    0/1 points are multiplication-free) + k-1 prod_reduce mults per
    element + the real fold, summed over halving rounds."""
    total = 0
    s = 1 << n_vars
    while s > 1:
        half = s // 2
        spec = (degree - 1) * k * half  # lerps for points >= 2
        prods = (k - 1) * half * (degree + 1)
        fold = k * half
        total += spec + prods + fold
        s = half
    return total
