"""HTC-SW oracle: cellwise vs rowwise fill parity + CIGAR sanity."""

import numpy as np
import pytest

from acc_genomics_tpu.io.synth import gen_sw_batch
from acc_genomics_tpu.ops.sw.reference import (
    OVERHANG_IGNORE,
    OVERHANG_INDEL,
    OVERHANG_LEADING_INDEL,
    OVERHANG_SOFTCLIP,
    STATE_MATCH,
    STATE_DELETION,
    STATE_INSERTION,
    sw_align_oracle,
    sw_backtrack,
    sw_fill_cellwise,
    sw_fill_rowwise,
)

ALL_STRATEGIES = [
    OVERHANG_SOFTCLIP,
    OVERHANG_INDEL,
    OVERHANG_LEADING_INDEL,
    OVERHANG_IGNORE,
]


@pytest.mark.parametrize("strategy", ALL_STRATEGIES)
def test_rowwise_matches_cellwise(rng, strategy):
    ref, alts = gen_sw_batch(rng, 6, ref_len=60)
    for alt in alts:
        sw_a, bt_a = sw_fill_cellwise(ref, alt, strategy)
        sw_b, bt_b = sw_fill_rowwise(ref, alt, strategy)
        np.testing.assert_array_equal(sw_a, sw_b)
        np.testing.assert_array_equal(bt_a, bt_b)


def test_identical_sequences_give_full_match(rng):
    ref = rng.integers(0, 4, 50).astype(np.uint8)
    for strategy in ALL_STRATEGIES:
        cigar, offset = sw_align_oracle(ref, ref, strategy)
        assert cigar == [(50, STATE_MATCH)]
        assert offset == 0


def test_deletion_detected(rng):
    ref = rng.integers(0, 4, 60).astype(np.uint8)
    alt = np.concatenate([ref[:20], ref[25:]])  # 5bp deletion
    cigar, offset = sw_align_oracle(ref, alt, OVERHANG_SOFTCLIP)
    assert (5, STATE_DELETION) in cigar
    total_alt = sum(l for l, s in cigar if s in (STATE_MATCH, STATE_INSERTION, 4))
    assert total_alt == len(alt)


def test_insertion_detected(rng):
    ref = rng.integers(0, 4, 60).astype(np.uint8)
    ins = rng.integers(0, 4, 4).astype(np.uint8)
    alt = np.concatenate([ref[:30], ins, ref[30:]])
    cigar, offset = sw_align_oracle(ref, alt, OVERHANG_SOFTCLIP)
    assert (4, STATE_INSERTION) in cigar


def test_cigar_consumes_sequences(rng):
    ref, alts = gen_sw_batch(rng, 8, ref_len=100)
    for alt in alts:
        for strategy in ALL_STRATEGIES:
            cigar, offset = sw_align_oracle(ref, alt, strategy)
            alt_used = sum(l for l, s in cigar if s in (STATE_MATCH, STATE_INSERTION, 4))
            assert alt_used == len(alt), (strategy, cigar)
