"""Batched XLA SW fill vs oracle: exact CIGAR + offset parity."""

import numpy as np
import pytest

from acc_genomics_tpu.io.synth import gen_sw_batch
from acc_genomics_tpu.ops.sw.jax_impl import sw_align_batch
from acc_genomics_tpu.ops.sw.reference import (
    OVERHANG_IGNORE,
    OVERHANG_INDEL,
    OVERHANG_LEADING_INDEL,
    OVERHANG_SOFTCLIP,
    sw_align_oracle,
)

ALL_STRATEGIES = [
    OVERHANG_SOFTCLIP,
    OVERHANG_INDEL,
    OVERHANG_LEADING_INDEL,
    OVERHANG_IGNORE,
]


@pytest.mark.parametrize("strategy", ALL_STRATEGIES)
def test_batch_exact_vs_oracle(rng, strategy):
    ref, alts = gen_sw_batch(rng, 12, ref_len=80)
    refs = [ref] * len(alts)
    got = sw_align_batch(refs, alts, strategy, rows=96, cols=96)
    for alt, (cigar, offset) in zip(alts, got):
        want_cigar, want_offset = sw_align_oracle(ref, alt, strategy)
        assert cigar == want_cigar, (strategy, cigar, want_cigar)
        assert offset == want_offset


def test_mixed_lengths_exact(rng):
    refs, alts = [], []
    for ln in (10, 37, 64, 100, 5):
        r, (a,) = gen_sw_batch(rng, 1, ref_len=ln)
        refs.append(r)
        alts.append(a)
    got = sw_align_batch(refs, alts, OVERHANG_SOFTCLIP, rows=112, cols=112)
    for r, a, (cigar, offset) in zip(refs, alts, got):
        want_cigar, want_offset = sw_align_oracle(r, a, OVERHANG_SOFTCLIP)
        assert cigar == want_cigar
        assert offset == want_offset


def test_batch_sweep_sizes(rng):
    # reference driver sweeps batch sizes 1..256 (sw_host.cpp:218); we do a
    # lighter sweep incl. batch=1
    for batch in (1, 2, 7):
        ref, alts = gen_sw_batch(rng, batch, ref_len=50)
        got = sw_align_batch([ref] * batch, alts, OVERHANG_SOFTCLIP, rows=64, cols=64)
        for alt, (cigar, offset) in zip(alts, got):
            want = sw_align_oracle(ref, alt, OVERHANG_SOFTCLIP)
            assert (cigar, offset) == want
