#!/usr/bin/env python
"""BWA-MEM seeding pipeline driver: SMEM -> SA positions -> seed extension.

The composed workload the reference accelerates for bwa-flow (SMEM
seeding = 40% of BWA-MEM runtime, smem/README.md:6; extension =
mem_chain2aln).  Reports end-to-end reads/s and spot-checks extension
records against the oracle chain.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from acc_genomics_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()  # machine/kernel bodies are multi-minute cold compiles

from acc_genomics_tpu.engine.genomics_engine import GenomicsEngine
from acc_genomics_tpu.io.synth import gen_smem_reads
from acc_genomics_tpu.models import BwaMemSeeding
from acc_genomics_tpu.models.bwa_mem import BwaMemDevicePipeline
from acc_genomics_tpu.ops.extend.reference import extend_seed_oracle
from acc_genomics_tpu.ops.smem.index import FMIndex
from acc_genomics_tpu.ops.smem.reference import mem_collect_intv_oracle


def oracle_hits(fm, read, max_occ, flank, smem_params, ext_params):
    """Compose the full oracle chain for one read: SMEM intervals ->
    SA occurrence positions -> extend_seed_oracle, with the SAME seed
    enumeration policy as the pipelines (interval order, occurrence j
    ascending, occ capped at max_occ).  Returns the per-seed result
    tuples (qbeg, qend, rbeg, rend, score, trueScore, width, occ)."""
    text_len = fm.seq_len
    out = []
    for iv in mem_collect_intv_oracle(fm, read, smem_params):
        slen = iv["end"] - iv["start"]
        for pos in fm.sa[iv["x0"] : iv["x0"] + min(iv["s"], max_occ)]:
            pos = int(pos)
            span_lo = max(0, pos - iv["start"] - flank)
            span_hi = min(
                text_len, pos + slen + (len(read) - iv["end"]) + flank
            )
            rseq = fm.text[span_lo:span_hi]
            res = extend_seed_oracle(
                read, rseq, iv["start"], pos - span_lo, slen, ext_params
            )
            out.append(
                (
                    res["qBeg"], iv["end"] + res["qEnd"],
                    pos + res["rBeg"], pos + slen + res["rEnd"],
                    res["score"], res["trueScore"], res["width"], iv["s"],
                )
            )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome", type=int, default=2_000_000)
    ap.add_argument("--npz", help="load a cached FMIndex .npz (genome scale)")
    ap.add_argument("--reads", type=int, default=1024)
    ap.add_argument("--read-len", type=int, default=101)
    ap.add_argument("--batches", type=int, default=3)
    ap.add_argument("--check", type=int, default=8)
    ap.add_argument("--host-model", action="store_true",
                    help="use the host-composed path instead of the "
                    "device-resident pipeline")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    eng = GenomicsEngine()
    t0 = time.time()
    if args.npz:
        fm = FMIndex.load(args.npz)
        eng.set_index(fm)
        genome = fm.text[: fm.seq_len // 2]
    else:
        genome = rng.integers(0, 4, args.genome).astype(np.uint8)
        fm = eng.load_reference(genome)
    print(f"index: {time.time()-t0:.1f}s ({fm.seq_len // 2} bases)")
    # device-resident pipeline (SA + text in HBM, fused SA-gather ->
    # span-fetch -> left/right extension) unless --host-model
    bm = (
        BwaMemSeeding(eng)
        if args.host_model
        else BwaMemDevicePipeline(eng)
    )

    # warm the jit cache at the production batch shape
    warm = gen_smem_reads(rng, genome, args.reads, read_len=args.read_len)
    bm.map_reads(warm)

    total, total_hits = 0, 0
    rates = []
    failures = 0
    for b in range(args.batches):
        reads = gen_smem_reads(rng, genome, args.reads, read_len=args.read_len)
        t0 = time.time()
        hits = bm.map_reads(reads)
        dt = time.time() - t0
        total += len(reads)
        rates.append(len(reads) / dt)
        total_hits += sum(len(h) for h in hits)
        # oracle value check: full SMEM -> SA -> extension chain for the
        # first --check reads, comparing every SeedHit field exactly
        # (the reference's re-ordered exact record compare,
        # bwa-sw/sdaccel/main_cl.cpp:191-247)
        checked = 0
        for k in range(min(args.check, len(reads))):
            want = oracle_hits(
                fm, reads[k], bm.max_occ, bm.flank,
                eng.smem.params, eng.extend.config.params(),
            )
            got = [
                (h.qbeg, h.qend, h.rbeg, h.rend, h.score, h.true_score,
                 h.width, h.occ)
                for h in hits[k]
            ]
            checked += len(want)
            if got != want:
                failures += 1
                print(f"  MISMATCH read {k}: got {got[:3]}... want {want[:3]}...")
        print(
            f"batch {b}: {len(reads)/dt:.0f} reads/s, "
            f"{sum(len(h) for h in hits)} hits, "
            f"{checked} oracle-checked seed records"
        )
    # median: early batches may still be compiling fresh extend shapes
    steady = float(np.median(rates))
    print(
        f"== {steady:.0f} reads/s seeding+extension (median of "
        f"{args.batches} batches), {total_hits/total:.2f} hits/read "
        f"{'FAILED' if failures else 'PASSED'}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
