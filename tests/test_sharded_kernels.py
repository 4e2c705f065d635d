"""Data-parallel SMEM / extend / SW over the virtual 8-device mesh."""

import numpy as np
import jax.numpy as jnp

from acc_genomics_tpu.io.synth import gen_reference_with_repeats, gen_smem_reads
from acc_genomics_tpu.ops.extend.jax_impl import sw_extend_batch
from acc_genomics_tpu.ops.smem.index import FMIndex
from acc_genomics_tpu.ops.smem.machine import device_index_fused, smem_collect_machine
from acc_genomics_tpu.parallel import make_mesh
from acc_genomics_tpu.parallel.sharded_kernels import (
    smem_collect_dp,
    sw_extend_dp,
    sw_fill_dp,
)


def test_smem_dp_matches_single(rng):
    genome = gen_reference_with_repeats(rng, 1200)
    fm = FMIndex.build(genome)
    idx = device_index_fused(fm)
    reads = gen_smem_reads(rng, genome, 16, read_len=60)
    seq_tm = np.full((64, 16), 4, np.int32)
    lens = np.zeros(16, np.int32)
    for k, r in enumerate(reads):
        seq_tm[: len(r), k] = r
        lens[k] = len(r)
    seq_tm = jnp.asarray(seq_tm)
    lens = jnp.asarray(lens)

    mem1, n1, _ = smem_collect_machine(idx, seq_tm, lens)
    mesh = make_mesh((8, 1))
    mem8, n8, iters = smem_collect_dp(mesh, idx, seq_tm, lens)
    assert np.array_equal(np.asarray(n1), np.asarray(n8))
    for a, b in zip(mem1, mem8):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.asarray(iters).shape == (8,)


def test_extend_dp_matches_single(rng):
    B, Q, T = 16, 32, 48
    q = rng.integers(0, 4, (Q, B)).astype(np.int32)
    t = rng.integers(0, 4, (T, B)).astype(np.int32)
    qlen = np.full(B, Q, np.int32)
    tlen = np.full(B, T, np.int32)
    h0 = np.full(B, 20, np.int32)
    args = [jnp.asarray(v) for v in (q, t, qlen, tlen, h0, qlen, qlen)]
    r1 = sw_extend_batch(*args)
    mesh = make_mesh((8, 1))
    r8 = sw_extend_dp(mesh, *args)
    for k in r1:
        assert np.array_equal(np.asarray(r1[k]), np.asarray(r8[k]))


def test_sw_fill_dp_matches_single(rng):
    from acc_genomics_tpu.ops.sw.jax_impl import sw_fill

    B, R, C = 8, 24, 32
    ref = rng.integers(0, 4, (R, B)).astype(np.int32)
    alt = rng.integers(0, 4, (C, B)).astype(np.int32)
    rl = np.full(B, R, np.int32)
    al = np.full(B, C, np.int32)
    a = [jnp.asarray(v) for v in (ref, alt, rl, al)]
    bt1, lr1, ac1 = sw_fill(*a, 0)
    mesh = make_mesh((8, 1))
    bt8, lr8, ac8 = sw_fill_dp(mesh, *a, 0)
    assert np.array_equal(np.asarray(bt1), np.asarray(bt8))
    assert np.array_equal(np.asarray(lr1), np.asarray(lr8))
    assert np.array_equal(np.asarray(ac1), np.asarray(ac8))
