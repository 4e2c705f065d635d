"""Device-resident BWA-MEM pipeline vs the host-composed model.

The fused pipeline (SA gather + text span fetch + left/right extension
in one device program, models/bwa_mem.py _extend_seeds_fused) must
produce exactly the host model's SeedHits — same seed enumeration
policy, same ksw_extend2 semantics, same resolution.
"""

import numpy as np

from acc_genomics_tpu.engine.genomics_engine import GenomicsEngine
from acc_genomics_tpu.io.synth import gen_reference_with_repeats, gen_smem_reads
from acc_genomics_tpu.models.bwa_mem import BwaMemDevicePipeline, BwaMemSeeding


def test_device_pipeline_matches_host_model(rng):
    genome = gen_reference_with_repeats(rng, 8000, repeat_len=60, n_repeats=6)
    eng = GenomicsEngine()
    eng.load_reference(genome)
    reads = gen_smem_reads(rng, genome, 12, read_len=75)
    # one read with an N and one very short read
    reads[3][10] = 4
    reads[7] = reads[7][:30].copy()

    host = BwaMemSeeding(eng, max_occ=4, flank=40)
    want = host.map_reads(reads)
    dev = BwaMemDevicePipeline(eng, max_occ=4, flank=40)
    got = dev.map_reads(reads)

    assert len(got) == len(want)
    for r, (g, w) in enumerate(zip(got, want)):
        assert len(g) == len(w), (r, len(g), len(w))
        for gh, wh in zip(g, w):
            assert gh == wh, (r, gh, wh)


def test_device_pipeline_array_form(rng):
    import dataclasses

    from acc_genomics_tpu.config import EngineConfig, SmemConfig

    genome = gen_reference_with_repeats(rng, 5000)
    # the default interval caps (24/24) are tuned for 101 bp reads on
    # genome-scale indexes; this tiny repeat-heavy genome pushes more
    # break intervals per read, so size the caps for the workload (the
    # over-cap host-rerun contract itself is covered by
    # test_smem_machine.py::test_machine_curr_cap_bust_flags_host_rerun)
    cfg = dataclasses.replace(
        EngineConfig(), smem=SmemConfig(curr_cap=64, mem_cap=64)
    )
    eng = GenomicsEngine(cfg)
    eng.load_reference(genome)
    reads = gen_smem_reads(rng, genome, 6, read_len=60)
    dev = BwaMemDevicePipeline(eng, max_occ=2, flank=30)
    hits, rid, (qbeg, slen, occ), host_idx = dev.map_reads_arrays(reads)
    assert hits.shape[0] == 8
    assert hits.shape[1] == len(rid) == len(qbeg)
    assert not host_idx
    # scores positive for real seeds
    assert (hits[4] >= slen).all()


def test_device_pipeline_large_flank_near_boundaries(rng):
    """flank large enough that the span width exceeds the default text
    guard: the pipeline must auto-size its guard so dynamic slices never
    clamp (a clamped slice silently shifts the reference window)."""
    genome = gen_reference_with_repeats(rng, 3000)
    eng = GenomicsEngine()
    eng.load_reference(genome)
    # reads sampled right at the genome edges
    reads = [genome[:70].copy(), genome[-70:].copy(),
             genome[1000:1070].copy()]
    host = BwaMemSeeding(eng, max_occ=4, flank=300)
    dev = BwaMemDevicePipeline(eng, max_occ=4, flank=300)
    assert dev.text_guard >= 300 + eng.smem.config.seq_length
    got = dev.map_reads(reads)
    want = host.map_reads(reads)
    for g, w in zip(got, want):
        assert g == w
