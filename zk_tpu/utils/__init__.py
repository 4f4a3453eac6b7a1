"""Auxiliary utilities: PERF_LOG scope timers + analytic op counters."""

from zk_tpu.utils.stat import (  # noqa: F401
    end_timer,
    mle_eval_mults,
    start_timer,
    sumcheck_prover_mults,
    timer,
)
