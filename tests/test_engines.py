"""Engine facade + pipeline tests (CPU mesh)."""

import numpy as np
import pytest

from acc_genomics_tpu.config import EngineConfig, SWConfig
from acc_genomics_tpu.engine.extend_engine import ExtendEngine
from acc_genomics_tpu.engine.genomics_engine import GenomicsEngine
from acc_genomics_tpu.engine.sw_engine import SWEngine
from acc_genomics_tpu.io.synth import (
    gen_pairhmm_input,
    gen_reference_with_repeats,
    gen_smem_reads,
    gen_sw_batch,
)
from acc_genomics_tpu.models import BwaMemSeeding, HaplotypeCallerCore
from acc_genomics_tpu.ops.extend.reference import extend_seed_oracle
from acc_genomics_tpu.ops.smem.reference import mem_collect_intv_oracle
from acc_genomics_tpu.ops.sw.reference import sw_align_oracle


def test_sw_engine_matches_oracle_with_fallback(rng):
    cfg = SWConfig(seq_buckets=(64, 128))
    eng = SWEngine(cfg)
    ref, alts = gen_sw_batch(rng, 6, ref_len=100)
    # one oversized alt to trigger the host-fallback gate
    big_ref, (big_alt,) = gen_sw_batch(rng, 1, ref_len=200)
    refs = [ref] * 6 + [big_ref]
    alts = alts + [big_alt]
    got = eng.align(refs, alts, 0)
    assert eng.stats["host_fallback"] == 1
    for r, a, res in zip(refs, alts, got):
        assert res == sw_align_oracle(r, a, 0)


def test_extend_engine_seed_resolution(rng):
    eng = ExtendEngine()
    genome = rng.integers(0, 4, 600).astype(np.uint8)
    seeds = []
    wants = []
    for _ in range(9):
        pos = int(rng.integers(60, 400))
        read = genome[pos : pos + 100].copy()
        err = rng.random(100) < 0.05
        read[err] = (read[err] + rng.integers(1, 4, err.sum())) % 4
        qbeg = int(rng.integers(10, 40))
        slen = 21
        read[qbeg : qbeg + slen] = genome[pos + qbeg : pos + qbeg + slen]
        span = genome[pos - 50 : pos + 160]
        seeds.append(dict(read=read, rseq=span, qbeg=qbeg, rbeg_off=50 + qbeg, len=slen))
        wants.append(
            extend_seed_oracle(read, span, qbeg, 50 + qbeg, slen)
        )
    got = eng.extend_seeds(seeds)
    for g, w in zip(got, wants):
        assert g == w


def test_genomics_engine_and_pipelines(rng):
    cfg = EngineConfig()
    engine = GenomicsEngine(cfg)
    genome = gen_reference_with_repeats(rng, 3000, repeat_len=25, n_repeats=3)
    fm = engine.load_reference(genome)

    # SMEM through facade matches oracle
    reads = gen_smem_reads(rng, genome, 6, read_len=90, error_rate=0.01)
    ivs = engine.smem_collect(reads)
    for r, got in zip(reads, ivs):
        want = mem_collect_intv_oracle(fm, r)
        canon = lambda z: sorted(
            (i["x0"], i["x1"], i["s"], i["start"], i["end"]) for i in z
        )
        assert canon(got) == canon(want)

    # HaplotypeCaller core
    hc = HaplotypeCallerCore(engine)
    ref_window = genome[500:800]
    haps = [ref_window.copy()]
    alt = ref_window.copy()
    alt[150] = (alt[150] + 1) % 4
    haps.append(alt)
    hreads, _ = gen_pairhmm_input(rng, 5, 1, max_read_len=60, max_hap_len=64)
    # make read 0 an exact slice of hap 1 (the alt) so it prefers it
    hreads[0]["rs"] = alt[100:160].copy()
    hreads[0]["q"] = np.full(60, 40, np.uint8)
    hreads[0]["i"] = np.full(60, 45, np.uint8)
    hreads[0]["d"] = np.full(60, 45, np.uint8)
    hreads[0]["c"] = np.full(60, 10, np.uint8)
    region = hc.process_region(ref_window, haps, hreads)
    assert region.likelihoods.shape == (5, 2)
    assert region.best_hap[0] == 1
    cigar, offset = region.hap_cigars[0]
    assert cigar == [(300, 0)]  # ref vs itself: all match

    # BWA-MEM seeding pipeline: clean read maps back to its position
    bwa = BwaMemSeeding(engine)
    pos = 1200
    clean = genome[pos : pos + 80].copy()
    hits = bwa.map_reads([clean])[0]
    assert len(hits) >= 1
    best = max(hits, key=lambda h: h.score)
    assert best.score == 80  # full-length perfect extension
    assert best.rbeg == pos
    assert best.qbeg == 0


def test_hc_process_regions_batched(rng):
    """Batched multi-region processing == region-at-a-time results."""
    from acc_genomics_tpu.io.synth import gen_pairhmm_input, gen_sw_batch

    engine = GenomicsEngine()
    hc = HaplotypeCallerCore(engine)
    regions = []
    for _ in range(3):
        ref_window, haps = gen_sw_batch(rng, 2, ref_len=50)
        reads, _ = gen_pairhmm_input(rng, 3, 1, max_read_len=25, max_hap_len=40)
        regions.append((ref_window, haps, reads))
    batched = hc.process_regions(regions)
    for reg_in, got in zip(regions, batched):
        one = hc.process_region(*reg_in)
        np.testing.assert_allclose(got.likelihoods, one.likelihoods, rtol=1e-12)
        assert got.hap_cigars == one.hap_cigars
        np.testing.assert_array_equal(got.best_hap, one.best_hap)
