"""On-device SMEM engine vs NumPy oracle: exact interval parity."""

import numpy as np
import pytest

from acc_genomics_tpu.io.synth import gen_reference_with_repeats, gen_smem_reads
from acc_genomics_tpu.ops.smem.index import FMIndex
from acc_genomics_tpu.ops.smem.jax_impl import smem_batch, device_index
from acc_genomics_tpu.ops.smem.reference import mem_collect_intv_oracle


def canon(ivs):
    """Canonical sorted tuple set, like the reference's cmp after sort
    (smem/main.cpp:155-214) — exact (x0, x1, s, start, end) equality."""
    return sorted((iv["x0"], iv["x1"], iv["s"], iv["start"], iv["end"]) for iv in ivs)


@pytest.fixture(scope="module")
def fixture():
    rng = np.random.default_rng(77)
    genome = gen_reference_with_repeats(rng, 2000, repeat_len=35, n_repeats=6)
    fm = FMIndex.build(genome)
    return rng, genome, fm


def test_batch_exact_vs_oracle(fixture):
    rng, genome, fm = fixture
    reads = gen_smem_reads(rng, genome, 16, read_len=101, error_rate=0.02)
    got, overflow = smem_batch(fm, reads, seq_len=128)
    assert not overflow.any()
    for k, read in enumerate(reads):
        want = mem_collect_intv_oracle(fm, read)
        assert canon(got[k]) == canon(want), k


def test_batch_with_ambiguous_and_short(fixture):
    rng, genome, fm = fixture
    reads = gen_smem_reads(rng, genome, 8, read_len=60, error_rate=0.05, ambig_rate=0.05)
    reads += [np.array([0, 1, 2, 3], dtype=np.uint8)]  # too short for any seed
    reads += [np.full(30, 4, dtype=np.uint8)]  # all-N read
    got, overflow = smem_batch(fm, reads, seq_len=64)
    for k, read in enumerate(reads):
        want = mem_collect_intv_oracle(fm, read)
        assert canon(got[k]) == canon(want), k
    assert got[-1] == [] and got[-2] == []


def test_perfect_read_single_smem(fixture):
    rng, genome, fm = fixture
    # a read copied exactly from a unique region: one full-length SMEM
    read = genome[400:480].copy()
    got, _ = smem_batch(fm, [read], seq_len=96)
    want = mem_collect_intv_oracle(fm, read)
    assert canon(got[0]) == canon(want)
    full = [iv for iv in got[0] if iv["start"] == 0 and iv["end"] == len(read)]
    assert len(full) >= 1
