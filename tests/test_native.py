"""Native C++ runtime vs Python references."""

import numpy as np
import pytest

from acc_genomics_tpu import native
from acc_genomics_tpu.io.synth import gen_sw_batch, gen_pairhmm_pairs
from acc_genomics_tpu.ops.smem.index import _suffix_array
from acc_genomics_tpu.ops.sw.jax_impl import sw_fill, sw_backtrack_slim
from acc_genomics_tpu.ops.pairhmm.pack import pack_pairhmm_batch
from acc_genomics_tpu.ops.pairhmm.context import PairHMMContext

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib unavailable"
)


def test_sais_matches_prefix_doubling(rng):
    for n in (1, 2, 10, 500, 4000):
        text = rng.integers(0, 4, n).astype(np.uint8)
        sa_c = native.suffix_array(text)
        sa_py = _suffix_array(text)
        np.testing.assert_array_equal(sa_c, sa_py)


def test_sais_larger_alphabet(rng):
    text = rng.integers(0, 250, 3000).astype(np.uint8)
    sa = native.suffix_array(text)
    # validate sorted order directly
    for a, b in zip(sa[:-1], sa[1:]):
        sa_a = text[a:].tobytes()
        sa_b = text[b:].tobytes()
        assert sa_a < sa_b


def test_cigar_walk_matches_python(rng):
    import jax.numpy as jnp

    ref, alts = gen_sw_batch(rng, 10, ref_len=70)
    rows, cols = 80, 80
    bsz = len(alts)
    ref_tm = np.full((rows, bsz), 255, np.int32)
    alt_tm = np.full((cols, bsz), 255, np.int32)
    reflen = np.full(bsz, len(ref), np.int32)
    altlen = np.array([len(a) for a in alts], np.int32)
    for k, a in enumerate(alts):
        ref_tm[: len(ref), k] = ref
        alt_tm[: len(a), k] = a
    for strategy in range(4):
        bt, lastrow, altcol = sw_fill(
            jnp.asarray(ref_tm), jnp.asarray(alt_tm),
            jnp.asarray(reflen), jnp.asarray(altlen), strategy,
        )
        bt = np.asarray(bt).transpose(2, 0, 1)  # (B, R, C)
        lastrow = np.asarray(lastrow).T
        altcol = np.asarray(altcol).T
        got = native.cigar_walk(bt, lastrow, altcol, reflen, altlen, strategy)
        for k in range(bsz):
            want = sw_backtrack_slim(
                bt[k], lastrow[k], altcol[k], int(reflen[k]), int(altlen[k]), strategy
            )
            assert got[k] == want, (strategy, k)


def test_pairhmm_pack_matches_python(rng):
    tcs = gen_pairhmm_pairs(rng, 9, max_read_len=30, max_hap_len=50)
    ctx = PairHMMContext(np.float32)
    got = native.pairhmm_pack_native(
        tcs, 32, 56, ctx.ph2pr, ctx.match_to_match, ctx.initial_constant
    )
    arrs, rs_out, hap_ext, y0, lens, hlens = got
    want = pack_pairhmm_batch(tcs, rows=32, cols=56, dtype=np.float32, pad_lanes=False)
    names = ["p_mm", "p_gapm", "p_mx", "p_xx", "p_my", "p_yy", "em_match", "em_mis"]
    for a, name in zip(arrs, names):
        np.testing.assert_array_equal(a, getattr(want, name), err_msg=name)
    np.testing.assert_array_equal(rs_out, want.rs)
    np.testing.assert_array_equal(hap_ext, want.hap_ext)
    np.testing.assert_allclose(y0, want.y0, rtol=1e-6)
