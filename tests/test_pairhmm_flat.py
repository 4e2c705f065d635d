"""Flat (wire-format) PairHMM ingestion path vs the dict path.

compute_pairs_flat consumes the reference's own host-interface shape —
concatenated byte streams + per-pair lengths
(pairhmm/interface/PairHMMHostInterface.cpp:175-255) — and must produce
exactly what the per-dict path produces, including bucketing, oversize
host fallback, and the fp64 underflow recompute.
"""

import numpy as np
import pytest

from acc_genomics_tpu import native
from acc_genomics_tpu.config import PairHMMConfig
from acc_genomics_tpu.engine.pairhmm_engine import PairHMMEngine
from acc_genomics_tpu.io.synth import gen_pairhmm_pairs


def _flatten(tcs):
    cat = lambda key: (
        np.concatenate([np.asarray(t[key], np.uint8) for t in tcs])
        if tcs else np.zeros(0, np.uint8)
    )
    lens = np.array([len(t["rs"]) for t in tcs], np.int32)
    hlens = np.array([len(t["hap"]) for t in tcs], np.int32)
    return (cat("rs"), cat("q"), cat("i"), cat("d"), cat("c"), lens,
            cat("hap"), hlens)


def test_flat_matches_dict_path_portable(rng):
    tcs = gen_pairhmm_pairs(rng, 96, max_read_len=40, max_hap_len=80)
    cfg = PairHMMConfig(read_buckets=(32, 64), hap_buckets=(64, 128))
    a = PairHMMEngine(cfg, use_pallas=False)
    a.min_device_cells = 0
    want = a.compute_pairs(tcs)
    b = PairHMMEngine(cfg, use_pallas=False)
    b.min_device_cells = 0
    got = b.compute_pairs_flat(*_flatten(tcs))
    np.testing.assert_allclose(got, want, rtol=1e-12)


@pytest.mark.skipif(not native.available(), reason="needs native lib")
def test_flat_pallas_interpret_with_oversize(rng):
    """The full flat path (native pack + Pallas kernel in interpret mode +
    concurrent host fallback + flat fp64 recompute) vs the dict path."""
    tcs = gen_pairhmm_pairs(rng, 40, max_read_len=30, max_hap_len=60)
    # oversize pair -> concurrent native host fallback
    big = dict(tcs[0])
    for k in ("rs", "q", "i", "d", "c"):
        big[k] = np.resize(np.asarray(tcs[0][k], np.uint8), 80)
    tcs.append(big)
    cfg = PairHMMConfig(read_buckets=(32, 64), hap_buckets=(64,))
    a = PairHMMEngine(cfg, use_pallas=False)
    a.min_device_cells = 0
    want = a.compute_pairs(tcs)

    b = PairHMMEngine(cfg, use_pallas=True)
    b._interpret = True
    got = b.compute_pairs_flat(*_flatten(tcs))
    assert b.stats.get("host_fallback", 0) == 1
    assert b.stats["device_calls"] >= 1
    np.testing.assert_allclose(got, want, rtol=5e-3)


def test_flat_stream_matches_single_calls(rng):
    tcs_batches = [
        gen_pairhmm_pairs(rng, 40, max_read_len=30, max_hap_len=60)
        for _ in range(3)
    ]
    cfg = PairHMMConfig(read_buckets=(32, 64), hap_buckets=(64,))
    eng = PairHMMEngine(cfg, use_pallas=False)
    eng.min_device_cells = 0
    batches = [_flatten(t) for t in tcs_batches]
    got = eng.compute_pairs_flat_stream(batches)
    for b, g in zip(batches, got):
        eng2 = PairHMMEngine(cfg, use_pallas=False)
        eng2.min_device_cells = 0
        np.testing.assert_allclose(g, eng2.compute_pairs_flat(*b), rtol=1e-12)


@pytest.mark.skipif(not native.available(), reason="needs native lib")
def test_flat_f32_upload_mode_interpret(rng):
    """upload='f32' ships precomputed coefficient planes in two packed
    buffers (pairhmm_forward_pallas_packed_f32).  Same kernel + same
    tables, but the coefficient arithmetic runs in C vs XLA (which
    strength-reduces x/3 to a reciprocal multiply), so agreement is
    1-2 ulp rather than bitwise — far inside the 5e-3 contract."""
    tcs = gen_pairhmm_pairs(rng, 50, max_read_len=30, max_hap_len=60)
    outs = {}
    for mode in ("quals", "quals_arith", "f32"):
        cfg = PairHMMConfig(
            read_buckets=(32,), hap_buckets=(64,),
            upload="f32" if mode == "f32" else "quals",
            quals_expand="arith" if mode == "quals_arith" else "gather",
        )
        eng = PairHMMEngine(cfg, use_pallas=True)
        eng._interpret = True
        outs[mode] = eng.compute_pairs_flat(*_flatten(tcs))
    # gather expansion uses the very same tables as the host pack:
    # 1-2 ulp agreement
    np.testing.assert_allclose(outs["quals"], outs["f32"], rtol=1e-6)
    # arith expansion computes ph2pr/matchToMatch on device (exp2 + the
    # telescoped Jacobian identity): <=27 ulp coefficient agreement, so
    # final log-likelihoods match to ~1e-5 — far inside the 5e-3 contract
    np.testing.assert_allclose(outs["quals_arith"], outs["f32"], rtol=2e-4)
