#!/usr/bin/env python
"""SMEM end-to-end driver: exact golden comparison + reads/s scoreboard.

The analog of smem/main.cpp randomTest: builds (or loads) an index, runs
batches of reads through the device engine and the host oracle, compares
intervals exactly after canonical sort, and reports reads/s plus the
analytical BWT-traffic bandwidth.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from acc_genomics_tpu.engine.genomics_engine import GenomicsEngine
from acc_genomics_tpu.io.synth import gen_reference_with_repeats, gen_smem_reads
from acc_genomics_tpu.ops.smem.reference import mem_collect_intv_oracle


def canon(ivs):
    return sorted((iv["x0"], iv["x1"], iv["s"], iv["start"], iv["end"]) for iv in ivs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome", type=int, default=50_000)
    ap.add_argument("--reads", type=int, default=2048)
    ap.add_argument("--read-len", type=int, default=101)
    ap.add_argument("--batches", type=int, default=3)
    ap.add_argument("--check", type=int, default=32, help="reads golden-checked per batch")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    genome = gen_reference_with_repeats(rng, args.genome)
    engine = GenomicsEngine()
    t0 = time.time()
    fm = engine.load_reference(genome)
    print(f"index built+uploaded in {time.time()-t0:.2f}s ({fm.seq_len} bases)")

    # warm the jit cache at the real batch shape before timing
    engine.smem_collect(gen_smem_reads(rng, genome, args.reads, read_len=args.read_len))

    failures = 0
    total_reads = 0
    total_time = 0.0
    for b in range(args.batches):
        reads = gen_smem_reads(rng, genome, args.reads, read_len=args.read_len)
        t0 = time.time()
        got = engine.smem_collect(reads)
        dt = time.time() - t0
        total_reads += len(reads)
        total_time += dt
        for k in range(min(args.check, len(reads))):
            want = mem_collect_intv_oracle(fm, reads[k])
            if canon(got[k]) != canon(want):
                failures += 1
        n_iv = sum(len(g) for g in got)
        print(
            f"batch {b}: {len(reads)} reads {len(reads)/dt:.0f} reads/s "
            f"{n_iv} intervals "
            f"overflow reruns {engine.smem.stats['overflow_reruns']}"
        )
    # analytical BWT probe traffic (2 probes x 32 B per machine iteration
    # per lane), the analog of the reference's per-bank DRAM accounting
    # (smem/host/baseline.cpp, smem/main.cpp:352-366)
    iters = engine.smem.stats["probe_iters"]
    traffic = iters * 2 * 32 * args.reads
    print(
        f"== {total_reads/total_time:.0f} reads/s, "
        f"{traffic/total_time/1e9:.2f} GB/s probe traffic "
        f"{'FAILED' if failures else 'PASSED'}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
