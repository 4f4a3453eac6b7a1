"""PERF_LOG scope timers (stat crate parity) + analytic op counters."""

import os

from zk_tpu.utils import (
    end_timer,
    mle_eval_mults,
    start_timer,
    sumcheck_prover_mults,
    timer,
)


def test_disabled_by_default(capsys):
    os.environ.pop("PERF_LOG", None)
    start_timer("scope")
    end_timer()
    assert capsys.readouterr().err == ""


def test_nested_indentation(capsys):
    os.environ["PERF_LOG"] = "true"
    try:
        with timer("outer"):
            with timer("inner"):
                pass
        out = capsys.readouterr().err
        assert "outer (begin)" in out
        assert " inner (begin)" in out  # indented one space
        assert "inner (end)" in out
        assert "outer (end)" in out
        # inner closes before outer
        assert out.index("inner (end)") < out.index("outer (end)")
    finally:
        os.environ.pop("PERF_LOG", None)


def test_mle_eval_mults():
    # ~2^n mults: 2^(n-1) + 2^(n-2) + ... + 1 (evaluation_form.rs:54-79)
    assert mle_eval_mults(3) == 7
    assert mle_eval_mults(20) == (1 << 20) - 1


def test_sumcheck_prover_mults_degree1():
    # degree-1 single factor: only the real fold multiplies
    assert sumcheck_prover_mults(3, degree=1, k=1) == 7
    assert sumcheck_prover_mults(24, degree=1, k=1) == (1 << 24) - 1


def test_sumcheck_prover_mults_grows_with_degree_and_factors():
    base = sumcheck_prover_mults(10, degree=1, k=1)
    assert sumcheck_prover_mults(10, degree=2, k=2) > base
    assert sumcheck_prover_mults(10, degree=3, k=3) > sumcheck_prover_mults(
        10, degree=2, k=2
    )
