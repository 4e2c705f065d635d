"""PairHMM NumPy oracle: hand-computed cases + numeric contracts."""

import numpy as np
import pytest

from acc_genomics_tpu.io.synth import gen_pairhmm_pairs
from acc_genomics_tpu.ops.pairhmm.context import PairHMMContext
from acc_genomics_tpu.ops.pairhmm.reference import (
    pairhmm_loglik_oracle,
    pairhmm_oracle,
)


def brute_force_pairhmm(rs, q, i, d, c, hap, dtype=np.float64):
    """Cell-by-cell scalar implementation straight from the recurrence
    definition — an independent cross-check for the vectorised oracle."""
    dt = np.dtype(dtype).type
    ctx = PairHMMContext(dtype)
    R, H = len(rs) + 1, len(hap) + 1
    p_mm, p_gapm, p_mx, p_xx, p_my, p_yy = ctx.transitions(i, d, c)
    em_m, em_x = ctx.emissions(q)
    M = np.zeros((R, H), dtype=dtype)
    X = np.zeros((R, H), dtype=dtype)
    Y = np.zeros((R, H), dtype=dtype)
    Y[0, :] = ctx.initial_constant / dt(len(hap))
    for r in range(1, R):
        X[r, 0] = X[r - 1, 0] * p_xx[r - 1]
        for col in range(1, H):
            match = rs[r - 1] == hap[col - 1] or rs[r - 1] == 4 or hap[col - 1] == 4
            distm = em_m[r - 1] if match else em_x[r - 1]
            M[r, col] = distm * (
                M[r - 1, col - 1] * p_mm[r - 1]
                + (X[r - 1, col - 1] + Y[r - 1, col - 1]) * p_gapm[r - 1]
            )
            X[r, col] = M[r - 1, col] * p_mx[r - 1] + X[r - 1, col] * p_xx[r - 1]
            Y[r, col] = M[r, col - 1] * p_my[r - 1] + Y[r, col - 1] * p_yy[r - 1]
    return dt(M[R - 1].sum() + X[R - 1].sum())


def test_context_tables():
    ctx = PairHMMContext(np.float64)
    assert ctx.ph2pr[0] == 1.0
    assert np.isclose(ctx.ph2pr[10], 0.1)
    assert np.isclose(ctx.ph2pr[20], 0.01)
    assert ctx.initial_constant == np.ldexp(1.0, 1020)
    ctx32 = PairHMMContext(np.float32)
    assert ctx32.initial_constant == np.float32(np.ldexp(1.0, 120))
    # matchToMatch: for i=j=40, P(not open either gap) ~ 1 - 2e-4
    m2m = ctx.mm_prob(40, 40)
    assert np.isclose(m2m, 1.0 - 2e-4, rtol=1e-3)
    # symmetric in (i, d)
    assert ctx.mm_prob(13, 47) == ctx.mm_prob(47, 13)


def test_single_base_exact():
    # read = 'A' vs hap = 'A', all quals q: closed form:
    #   Y0 = IC/1; M[1][1] = (1-eps)*pGapM*Y0[0]; X[1][*]=...,
    #   result = M[1][0] + M[1][1] + X[1][0] + X[1][1]
    ctx = PairHMMContext(np.float64)
    q = i = d = 10
    c = 10
    p_mm, p_gapm, p_mx, p_xx, _, _ = ctx.transitions([i], [d], [c])
    em_m, _ = ctx.emissions([q])
    ic = ctx.initial_constant
    expect = em_m[0] * p_gapm[0] * ic  # M[1][1], hlen=1
    # X[1][1] = M[0][1]*pMX + X[0][1]*pXX = 0; X[1][0] = 0
    got = pairhmm_oracle([0], [q], [i], [d], [c], [0], np.float64)
    assert np.isclose(got, expect, rtol=1e-12)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_oracle_matches_brute_force(rng, dtype):
    for tc in gen_pairhmm_pairs(rng, 6, max_read_len=24, max_hap_len=48):
        a = pairhmm_oracle(tc["rs"], tc["q"], tc["i"], tc["d"], tc["c"], tc["hap"], dtype)
        b = brute_force_pairhmm(tc["rs"], tc["q"], tc["i"], tc["d"], tc["c"], tc["hap"], dtype)
        assert np.isclose(a, b, rtol=1e-5), (a, b)


def test_float_vs_double_within_tolerance(rng):
    for tc in gen_pairhmm_pairs(rng, 4, max_read_len=48, max_hap_len=96):
        f = pairhmm_loglik_oracle(
            tc["rs"], tc["q"], tc["i"], tc["d"], tc["c"], tc["hap"], np.float32
        )
        dd = pairhmm_loglik_oracle(
            tc["rs"], tc["q"], tc["i"], tc["d"], tc["c"], tc["hap"], np.float64
        )
        assert abs(f - dd) / max(abs(dd), 1e-30) < 5e-3


def test_perfect_match_likelihood_dominates(rng):
    # a read that exactly matches the hap should score higher than a
    # heavily mismatched one
    hap = rng.integers(0, 4, 64).astype(np.uint8)
    quals = dict(
        q=np.full(32, 40, np.uint8),
        i=np.full(32, 45, np.uint8),
        d=np.full(32, 45, np.uint8),
        c=np.full(32, 10, np.uint8),
    )
    good = pairhmm_loglik_oracle(hap[:32], quals["q"], quals["i"], quals["d"], quals["c"], hap)
    bad_read = (hap[:32] + 2) % 4
    bad = pairhmm_loglik_oracle(bad_read, quals["q"], quals["i"], quals["d"], quals["c"], hap)
    assert good > bad + 10
