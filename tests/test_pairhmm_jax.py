"""Batched XLA PairHMM vs the NumPy oracle."""

import numpy as np

from acc_genomics_tpu.io.synth import gen_pairhmm_pairs
from acc_genomics_tpu.ops.pairhmm.pack import pack_pairhmm_batch
from acc_genomics_tpu.ops.pairhmm.jax_impl import forward_from_pack
from acc_genomics_tpu.ops.pairhmm.reference import pairhmm_oracle


def _check(tcs, rows, cols, dtype, rtol):
    pack = pack_pairhmm_batch(tcs, rows=rows, cols=cols, dtype=dtype)
    got = np.asarray(forward_from_pack(pack))[: pack.n_real]
    want = np.array(
        [
            pairhmm_oracle(tc["rs"], tc["q"], tc["i"], tc["d"], tc["c"], tc["hap"], dtype)
            for tc in tcs
        ]
    )
    np.testing.assert_allclose(got, want, rtol=rtol)


def test_forward_fp64_matches_oracle(rng):
    tcs = gen_pairhmm_pairs(rng, 12, max_read_len=31, max_hap_len=64)
    _check(tcs, rows=32, cols=64, dtype=np.float64, rtol=1e-10)


def test_forward_fp32_matches_oracle(rng):
    tcs = gen_pairhmm_pairs(rng, 12, max_read_len=47, max_hap_len=96)
    _check(tcs, rows=48, cols=96, dtype=np.float32, rtol=5e-3)


def test_forward_heavy_padding(rng):
    # short reads/haps in big buckets: absorbing rows + pad columns must
    # leave results identical to tight buckets
    tcs = gen_pairhmm_pairs(rng, 8, max_read_len=15, max_hap_len=24)
    pack_tight = pack_pairhmm_batch(tcs, rows=16, cols=24, dtype=np.float64)
    pack_loose = pack_pairhmm_batch(tcs, rows=64, cols=128, dtype=np.float64)
    a = np.asarray(forward_from_pack(pack_tight))[: pack_tight.n_real]
    b = np.asarray(forward_from_pack(pack_loose))[: pack_loose.n_real]
    np.testing.assert_allclose(a, b, rtol=1e-12)


def test_forward_mixed_lengths(rng):
    tcs = gen_pairhmm_pairs(rng, 16, max_read_len=63, max_hap_len=120)
    # force wide length spread incl. tiny
    tcs += gen_pairhmm_pairs(rng, 4, max_read_len=4, max_hap_len=6)
    _check(tcs, rows=64, cols=128, dtype=np.float64, rtol=1e-10)
