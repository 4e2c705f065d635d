"""Flat state-machine SMEM engine vs the NumPy oracle (exact)."""

import numpy as np
import pytest

from acc_genomics_tpu.io.synth import gen_reference_with_repeats, gen_smem_reads
from acc_genomics_tpu.ops.smem.index import FMIndex
from acc_genomics_tpu.ops.smem.machine import MAX_OUT, smem_batch_machine
from acc_genomics_tpu.ops.smem.reference import mem_collect_intv_oracle


def _canon(z):
    return sorted((i["x0"], i["x1"], i["s"], i["start"], i["end"]) for i in z)


def test_machine_exact_parity(rng):
    genome = gen_reference_with_repeats(rng, 2500)
    fm = FMIndex.build(genome)
    reads = gen_smem_reads(rng, genome, 12, read_len=80)
    # edge cases
    r = reads[0].copy()
    r[7] = 4
    r[50:55] = 4
    reads.append(r)                      # interior Ns
    reads.append(reads[1][:3].copy())    # shorter than min seed len
    reads.append(np.full(20, 4, np.uint8))  # all N
    got, ovf, _ = smem_batch_machine(fm, reads, seq_len=96)
    assert not ovf.any()
    for g, r in zip(got, reads):
        assert _canon(g) == _canon(mem_collect_intv_oracle(fm, r))


def test_machine_mixed_lengths_batch(rng):
    genome = gen_reference_with_repeats(rng, 1500)
    fm = FMIndex.build(genome)
    reads = [
        gen_smem_reads(rng, genome, 1, read_len=n)[0]
        for n in (21, 40, 64, 80, 95)
    ]
    got, ovf, _ = smem_batch_machine(fm, reads, seq_len=96)
    for g, r in zip(got, reads):
        assert _canon(g) == _canon(mem_collect_intv_oracle(fm, r))


def test_machine_overflow_flagged(rng):
    # a highly repetitive genome + repetitive read drives the interval
    # count over MAX_OUT: must be flagged, not silently truncated
    motif = rng.integers(0, 4, 12).astype(np.uint8)
    genome = np.tile(motif, 300)
    fm = FMIndex.build(genome)
    read = np.tile(motif, 8)[:90].copy()
    got, ovf, _ = smem_batch_machine(fm, [read], seq_len=96)
    want = mem_collect_intv_oracle(fm, read)
    if len(want) > MAX_OUT:
        assert ovf[0]
    else:
        assert not ovf[0]
        assert _canon(got[0]) == _canon(want)


def test_iteration_cap_flags_unfinished_lanes(rng):
    """A too-small safety cap must flag lanes for host rerun, never
    return silently-partial interval sets."""
    import jax.numpy as jnp

    from acc_genomics_tpu.ops.smem.machine import (
        device_index_fused,
        smem_collect_machine,
    )

    genome = gen_reference_with_repeats(rng, 1000)
    fm = FMIndex.build(genome)
    idx = device_index_fused(fm)
    reads = gen_smem_reads(rng, genome, 3, read_len=50)
    seq = np.full((64, 3), 4, np.int32)
    lens = np.zeros(3, np.int32)
    for k, r in enumerate(reads):
        seq[: len(r), k] = r
        lens[k] = len(r)
    _, n, _ = smem_collect_machine(
        idx, jnp.asarray(seq), jnp.asarray(lens), max_iters=2
    )
    assert (np.asarray(n) > MAX_OUT).all()


@pytest.mark.slow  # ~75s: many small jit shapes
def test_machine_fuzz_seeds(rng):
    """Exact parity across varied genome structures and seeds; the corpus
    exercises every oracle branch (backenlarge/forwardenlarge/skip/P2/P3 —
    verified by instrumentation)."""
    from acc_genomics_tpu.ops.smem.reference import DEFAULT_SMEM_PARAMS

    # caps sized for these repeat-heavy corpora (the production defaults
    # 24/24 bust chains here by DESIGN and route to host — that contract
    # is covered by test_machine_curr_cap_bust_flags_host_rerun; this
    # test wants overflow to keep its strong oracle meaning)
    params = DEFAULT_SMEM_PARAMS._replace(curr_cap=96, mem_cap=256)
    for seed, glen, rep_len, n_rep in ((7, 800, 20, 20), (11, 3000, 60, 4), (23, 1500, 35, 12)):
        r2 = np.random.default_rng(seed)
        genome = gen_reference_with_repeats(r2, glen, repeat_len=rep_len, n_repeats=n_rep)
        fm = FMIndex.build(genome)
        reads = gen_smem_reads(r2, genome, 6, read_len=75)
        got, ovf, _ = smem_batch_machine(fm, reads, seq_len=80, params=params)
        for g, r, o in zip(got, reads, ovf):
            want = mem_collect_intv_oracle(fm, r)
            if o:
                assert len(want) > MAX_OUT
            else:
                assert _canon(g) == _canon(want)


def test_machine_curr_cap_bust_flags_host_rerun(rng):
    """Lanes whose break-interval chains outgrow the capped curr/back
    buffers are flagged for host rerun (never silently wrong), and the
    engine's rerun path restores exact parity."""
    from acc_genomics_tpu.config import SmemConfig
    from acc_genomics_tpu.engine.smem_engine import SmemEngine
    from acc_genomics_tpu.ops.smem.reference import SmemParams

    genome = gen_reference_with_repeats(rng, 2000)
    fm = FMIndex.build(genome)
    reads = gen_smem_reads(rng, genome, 4, read_len=60, error_rate=0.05)
    # a tiny cap forces busts on normal reads
    tight = SmemParams(curr_cap=2)
    got, ovf, _ = smem_batch_machine(fm, reads, seq_len=64, params=tight)
    assert ovf.any()
    # engine with the same tight cap reruns busted lanes on the host
    cfg = SmemConfig()
    eng = SmemEngine(fm, cfg)
    eng.params = tight
    out = eng.collect(reads)
    for r, g in zip(reads, out):
        assert _canon(g) == _canon(mem_collect_intv_oracle(fm, r))
    assert eng.stats["overflow_reruns"] > 0


def test_repeat_heavy_genome_default_caps(rng):
    """Repeat-heavy genome (tandem 8-mer motif): backward chains stay wide
    for the whole read, stressing the default curr/back caps and the
    iteration budget.  The contract: every lane either finishes EXACTLY
    or is flagged for host rerun — never silently wrong — and the engine
    output equals the oracle either way."""
    from acc_genomics_tpu.engine.smem_engine import SmemEngine

    motif = rng.integers(0, 4, 8).astype(np.uint8)
    genome = np.tile(motif, 2500)  # 20 kb of pure tandem repeat
    # break perfect periodicity a little so passes do real work
    mut = rng.random(len(genome)) < 0.02
    genome[mut] = (genome[mut] + rng.integers(1, 4, mut.sum())) % 4
    fm = FMIndex.build(genome)
    reads = gen_smem_reads(rng, genome, 6, read_len=101, error_rate=0.01)
    got, ovf, _ = smem_batch_machine(fm, reads, seq_len=128)
    checked_exact = 0
    for r, g, o in zip(reads, got, ovf):
        want = mem_collect_intv_oracle(fm, r)
        if not o:
            assert _canon(g) == _canon(want)
            checked_exact += 1
    # engine-level: overflow/bust lanes rerun on host -> always exact
    eng = SmemEngine(fm)
    out = eng.collect(reads)
    for r, g in zip(reads, out):
        assert _canon(g) == _canon(mem_collect_intv_oracle(fm, r))


def test_multiread_machine_exact(rng):
    """Multi-read machine (Q reads per lane, in-body switching, per-read
    bnd boundaries) is exact vs the oracle, including N reads, short
    reads, all-N reads, mixed lengths, and trailing pads."""
    from acc_genomics_tpu.config import SmemConfig
    from acc_genomics_tpu.engine.smem_engine import SmemEngine

    genome = gen_reference_with_repeats(rng, 4000)
    fm = FMIndex.build(genome)
    reads = gen_smem_reads(rng, genome, 37, read_len=80)
    reads[0][33] = 4                         # N mid-read
    reads[5] = reads[5][:25].copy()          # short
    reads[9] = genome[:80].copy()            # text start
    reads[10] = genome[-80:].copy()          # text end (revcomp boundary)
    reads.append(np.full(30, 4, np.uint8))   # all N
    # batch_size 8 -> Q = ceil(38/8) = 5 reads per lane, 2 pad reads
    cfg = SmemConfig(batch_size=8, read_buckets=(96,), seq_length=96)
    eng = SmemEngine(fm, cfg)
    got = eng.collect(reads)
    for k, r in enumerate(reads):
        assert _canon(got[k]) == _canon(mem_collect_intv_oracle(fm, r)), k


def test_multiread_busts_rerun_per_read(rng):
    """A read whose chains bust the caps inside a multi-read lane flags
    ONLY that read for host rerun; the lane's other reads stay device-
    exact, and the engine restores full parity."""
    from acc_genomics_tpu.config import SmemConfig
    from acc_genomics_tpu.engine.smem_engine import SmemEngine

    motif = rng.integers(0, 4, 8).astype(np.uint8)
    genome = np.tile(motif, 1500)  # tandem repeat: wide chains
    mut = rng.random(len(genome)) < 0.02
    genome[mut] = (genome[mut] + rng.integers(1, 4, mut.sum())) % 4
    fm = FMIndex.build(genome)
    reads = gen_smem_reads(rng, genome, 18, read_len=90, error_rate=0.01)
    cfg = SmemConfig(batch_size=4, read_buckets=(96,), seq_length=96)
    eng = SmemEngine(fm, cfg)
    out = eng.collect(reads)
    for k, r in enumerate(reads):
        assert _canon(out[k]) == _canon(mem_collect_intv_oracle(fm, r)), k


def test_multiread_collect_arrays_matches_oneshot(rng):
    """collect_arrays' multi-read path returns the same per-read interval
    sets as one-shot single-batch calls (dense layout re-check)."""
    from acc_genomics_tpu.config import SmemConfig
    from acc_genomics_tpu.engine.smem_engine import SmemEngine

    genome = gen_reference_with_repeats(rng, 3000)
    fm = FMIndex.build(genome)
    n = 26
    reads = gen_smem_reads(rng, genome, n, read_len=70)
    seq = np.full((96, n), 4, np.uint8)
    lens = np.zeros(n, np.int32)
    for k, r in enumerate(reads):
        seq[: len(r), k] = r
        lens[k] = len(r)
    one = SmemEngine(fm, SmemConfig(batch_size=64, seq_length=96))
    multi = SmemEngine(fm, SmemConfig(batch_size=8, seq_length=96))
    m1, n1, o1 = one.collect_arrays(seq, lens)
    m2, n2, o2 = multi.collect_arrays(seq, lens)
    for k in range(n):
        if o1[k] or o2[k]:
            continue
        a = sorted(tuple(m1[:, j, k]) for j in range(n1[k]))
        b = sorted(tuple(m2[:, j, k]) for j in range(n2[k]))
        assert a == b, k


def test_collect_arrays_no_intervals(rng):
    """All-N / zero-length reads produce zero counts through both fetch
    routes (the ragged flat-gather's tot == 0 branch ships nothing)."""
    from acc_genomics_tpu.config import SmemConfig
    from acc_genomics_tpu.engine.smem_engine import SmemEngine

    genome = gen_reference_with_repeats(rng, 2000)
    fm = FMIndex.build(genome)
    n = 10
    seq = np.full((96, n), 4, np.uint8)  # every base is N
    lens = np.full(n, 60, np.int32)
    lens[-2:] = 0  # plus genuinely empty reads
    for cfg in (SmemConfig(batch_size=64, seq_length=96),
                SmemConfig(batch_size=4, seq_length=96)):  # multi route
        eng = SmemEngine(fm, cfg)
        mem, nn, ovf = eng.collect_arrays(seq, lens)
        assert nn.shape == (n,) and not nn.any() and not ovf.any()
        assert mem.shape[0] == 5 and mem.shape[2] == n
