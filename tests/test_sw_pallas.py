"""Pallas SW kernel vs oracle (interpret mode on CPU)."""

import numpy as np
import pytest

from acc_genomics_tpu.io.synth import gen_sw_batch
from acc_genomics_tpu.ops.sw.kernel import sw_align_batch_pallas
from acc_genomics_tpu.ops.sw.reference import sw_align_oracle

ALL_STRATEGIES = [0, 1, 2, 3]


@pytest.mark.parametrize(
    "strategy",
    # one strategy stays in the default run; the rest are slow (interpret
    # mode costs ~90s each)
    [0] + [pytest.param(s, marks=pytest.mark.slow) for s in ALL_STRATEGIES[1:]],
)
def test_pallas_sw_exact(rng, strategy):
    ref, alts = gen_sw_batch(rng, 5, ref_len=40)
    got = sw_align_batch_pallas([ref] * 5, alts, strategy, rows=48, cols=48,
                                interpret=True)
    for a, res in zip(alts, got):
        assert res == sw_align_oracle(ref, a, strategy)


def test_pallas_sw_mixed_lengths(rng):
    refs, alts = [], []
    for ln in (10, 30, 44):
        r, (a,) = gen_sw_batch(rng, 1, ref_len=ln)
        refs.append(r)
        alts.append(a)
    got = sw_align_batch_pallas(refs, alts, 0, rows=48, cols=48, interpret=True)
    for r, a, res in zip(refs, alts, got):
        assert res == sw_align_oracle(r, a, 0)


@pytest.mark.parametrize("strategy", [0, 1, 2, 3])
def test_pallas_sw_tie_breaking_stress(rng, strategy):
    """Degenerate inputs with massive score ties: identical sequences,
    homopolymers, periodic repeats — the vectorized start-cell selection
    must reproduce GATK's sequential tie-break chain exactly."""
    # lengths sized so everything fits the 32x32 bucket: interpret-mode
    # cost scales with rows*cols*steps and this test runs 4 strategies
    # (48x48 was ~490s of suite time for identical coverage)
    cases = []
    ref1 = rng.integers(0, 4, 22).astype(np.uint8)
    cases.append((ref1, ref1.copy()))                      # identical
    cases.append((np.zeros(18, np.uint8), np.zeros(22, np.uint8)))  # homopolymer
    cases.append((np.zeros(22, np.uint8), np.zeros(13, np.uint8)))
    per = np.tile(np.array([0, 1], np.uint8), 11)
    cases.append((per, np.tile(np.array([0, 1], np.uint8), 9)))     # periodic
    cases.append((per, np.roll(per, 1)))                   # phase-shifted
    ref2 = rng.integers(0, 4, 12).astype(np.uint8)
    cases.append((ref2, np.concatenate([ref2, ref2])))     # tandem duplicate
    cases.append((np.concatenate([ref2, ref2]), ref2))
    refs = [r for r, _ in cases]
    alts = [a for _, a in cases]
    got = sw_align_batch_pallas(refs, alts, strategy, rows=32, cols=32,
                                interpret=True)
    for (r, a), res in zip(cases, got):
        want = sw_align_oracle(r, a, strategy)
        assert ([tuple(e) for e in want[0]], want[1]) == (
            [tuple(e) for e in res[0]], res[1]), (strategy, r[:8], a[:8])


@pytest.mark.slow  # ~200s in interpret mode
def test_pallas_sw_element_overflow_reruns_on_host(rng):
    """Pairs whose CIGAR exceeds the shipped element prefix must fall
    back to the host oracle (the interval-overflow contract analog)."""
    from acc_genomics_tpu.ops.sw.walker import SHIP_ELEMS

    # alternating match/insert pattern: ~2 elements per 3 alt bases
    ref = rng.integers(0, 4, 96).astype(np.uint8)
    alt = []
    for j, b in enumerate(ref):
        alt.append(b)
        if j % 2 == 0:
            alt.append((b + 1) % 4 + 0)  # insertion vs ref
            alt.append((b + 2) % 4 + 0)
    alt = np.asarray(alt, np.uint8)[:160]
    wc, wo = sw_align_oracle(ref, alt, 0)
    assert len(wc) > SHIP_ELEMS  # the premise: a genuinely long CIGAR
    got = sw_align_batch_pallas([ref], [alt], 0, rows=96, cols=192,
                                interpret=True)
    assert got[0] == (wc, wo)
