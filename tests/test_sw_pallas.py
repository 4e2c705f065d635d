"""Pallas SW kernel vs oracle (interpret mode on CPU)."""

import numpy as np
import pytest

from acc_genomics_tpu.io.synth import gen_sw_batch
from acc_genomics_tpu.ops.sw.kernel import sw_align_batch_pallas
from acc_genomics_tpu.ops.sw.reference import sw_align_oracle

ALL_STRATEGIES = [0, 1, 2, 3]


@pytest.mark.parametrize("strategy", ALL_STRATEGIES)
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
