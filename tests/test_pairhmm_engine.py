"""End-to-end engine: bucketing, mixed shapes, underflow recompute."""

import numpy as np

from acc_genomics_tpu.config import PairHMMConfig
from acc_genomics_tpu.engine import plan_buckets
from acc_genomics_tpu.engine.pairhmm_engine import PairHMMEngine
from acc_genomics_tpu.io.synth import gen_pairhmm_input, gen_pairhmm_pairs
from acc_genomics_tpu.ops.pairhmm.reference import pairhmm_loglik_oracle


def test_bucket_plan(rng):
    plan = plan_buckets([10, 60, 100], [50, 300, 1000], (32, 64, 128), (128, 512, 1024))
    assert plan.groups[(32, 128)] == [0]
    assert plan.groups[(64, 512)] == [1]
    assert plan.groups[(128, 1024)] == [2]
    try:
        plan_buckets([200], [10], (32, 64, 128), (128,))
        assert False
    except ValueError:
        pass


def test_engine_matches_oracle(rng):
    engine = PairHMMEngine(
        PairHMMConfig(read_buckets=(16, 32, 64), hap_buckets=(32, 64, 128))
    )
    tcs = gen_pairhmm_pairs(rng, 40, max_read_len=50, max_hap_len=100)
    tcs += gen_pairhmm_pairs(rng, 10, max_read_len=10, max_hap_len=20)
    got = engine.compute_pairs(tcs)
    want = np.array(
        [
            pairhmm_loglik_oracle(t["rs"], t["q"], t["i"], t["d"], t["c"], t["hap"])
            for t in tcs
        ]
    )
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-12)
    assert rel.max() < 5e-3


def test_engine_underflow_recompute(rng):
    # long mismatching read -> fp32 underflow -> fp64 recompute path
    engine = PairHMMEngine(PairHMMConfig(read_buckets=(128,), hap_buckets=(128,)))
    hap = rng.integers(0, 4, 120).astype(np.uint8)
    read = (hap[:120] + 2) % 4  # all mismatches
    tc = dict(
        rs=read.astype(np.uint8),
        q=np.full(120, 50, np.uint8),
        i=np.full(120, 45, np.uint8),
        d=np.full(120, 45, np.uint8),
        c=np.full(120, 10, np.uint8),
        hap=hap,
    )
    got = engine.compute_pairs([tc])
    assert engine.stats["recomputed"] == 1
    want = pairhmm_loglik_oracle(tc["rs"], tc["q"], tc["i"], tc["d"], tc["c"], tc["hap"])
    assert np.isfinite(got[0])
    assert abs(got[0] - want) / abs(want) < 5e-3


def test_engine_matrix_layout(rng):
    engine = PairHMMEngine(
        PairHMMConfig(read_buckets=(32,), hap_buckets=(64,))
    )
    reads, haps = gen_pairhmm_input(rng, 3, 4, max_read_len=30, max_hap_len=64)
    m = engine.compute_matrix(reads, haps)
    assert m.shape == (3, 4)
    want = pairhmm_loglik_oracle(
        reads[1]["rs"], reads[1]["q"], reads[1]["i"], reads[1]["d"], reads[1]["c"],
        haps[2],
    )
    assert abs(m[1, 2] - want) / abs(want) < 5e-3


def test_engine_empty():
    engine = PairHMMEngine()
    assert engine.compute_pairs([]).shape == (0,)


def test_oversized_pairs_route_to_host(rng):
    """Pairs beyond the largest bucket run on the host engine (the
    reference's per-segment AVX fallback), mixed with device pairs."""
    from acc_genomics_tpu.io.synth import gen_pairhmm_pairs
    from acc_genomics_tpu.ops.pairhmm.reference import pairhmm_loglik_oracle

    eng = PairHMMEngine()
    eng.min_device_cells = 0  # force the device path for in-bucket pairs
    tcs = gen_pairhmm_pairs(rng, 6, max_read_len=40, max_hap_len=80)
    # one oversized read, one oversized hap
    big = gen_pairhmm_pairs(rng, 2, max_read_len=30, max_hap_len=60)
    nr = eng.config.max_read_len + 5
    reps = nr // len(big[0]["rs"]) + 1
    big[0]["rs"] = np.tile(big[0]["rs"], reps)[:nr]
    for k in ("q", "i", "d", "c"):
        big[0][k] = np.tile(big[0][k], reps)[:nr]
    nh = eng.config.max_hap_len + 7
    big[1]["hap"] = np.tile(big[1]["hap"], nh // len(big[1]["hap"]) + 1)[:nh]
    tcs = tcs[:3] + [big[0]] + tcs[3:] + [big[1]]
    out = eng.compute_pairs(tcs)
    assert eng.stats.get("host_fallback", 0) == 2
    for t, got in zip(tcs, out):
        want = pairhmm_loglik_oracle(t["rs"], t["q"], t["i"], t["d"], t["c"], t["hap"])
        assert abs((got - want) / want) < 5e-3
