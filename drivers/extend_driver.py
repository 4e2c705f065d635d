#!/usr/bin/env python
"""BWA-SW extension driver: exact comparison of seed extension records.

The analog of bwa-sw/sdaccel/main_cl.cpp: batches of (read, chain, seed)
tasks run through the batched engine; the 5-int result records
(qBeg,qEnd),(rBeg,rEnd),(score,trueScore),width compare exactly against
the oracle, reordered by seed index.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from acc_genomics_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()  # machine/kernel bodies are multi-minute cold compiles

from acc_genomics_tpu.engine.genomics_engine import GenomicsEngine
from acc_genomics_tpu.ops.extend.reference import extend_seed_oracle


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tasks", type=int, default=128)
    ap.add_argument("--read-len", type=int, default=101)
    ap.add_argument(
        "--records",
        metavar="FILE",
        help="run a binary (read,chain,seed) record dump in the reference's "
        "format (bwa-sw/sdaccel/main_cl.cpp); requires --genome-npy",
    )
    ap.add_argument("--genome-npy", help="forward nt4 reference for --records")
    ap.add_argument("--golden", help="5-int result dump to compare against")
    args = ap.parse_args()

    if args.records:
        from acc_genomics_tpu.io import bwasw_records as br

        genome = np.load(args.genome_npy)
        engine = GenomicsEngine()
        tasks = br.read_task_file(args.records)
        t0 = time.time()
        got = br.run_tasks(engine.extend, genome, tasks)
        dt = time.time() - t0
        print(f"{len(got)} tasks in {dt*1e3:.1f}ms")
        if args.golden:
            base = {r["seed_index"]: r for r in br.read_results(args.golden)}
            diffs = sum(
                1 for r in got
                if any(base[r["seed_index"]][k] != r[k] for k in r)
            )
            print("Pass" if diffs == 0 else f"Failed ({diffs} diffs)")
            return 1 if diffs else 0
        return 0

    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 20_000).astype(np.uint8)
    engine = GenomicsEngine()

    seeds = []
    for _ in range(args.tasks):
        pos = int(rng.integers(200, len(genome) - 400))
        read = genome[pos : pos + args.read_len].copy()
        err = rng.random(args.read_len) < 0.04
        read[err] = (read[err] + rng.integers(1, 4, err.sum())) % 4
        qbeg = int(rng.integers(5, args.read_len - 30))
        slen = int(rng.integers(19, 25))
        read[qbeg : qbeg + slen] = genome[pos + qbeg : pos + qbeg + slen]
        span = genome[pos - 150 : pos + args.read_len + 150]
        seeds.append(dict(read=read, rseq=span, qbeg=qbeg, rbeg_off=150 + qbeg, len=slen))

    engine.extend_seeds(seeds)  # warm the jit cache at the real batch shapes
    t0 = time.time()
    got = engine.extend_seeds(seeds)
    dt = time.time() - t0
    failures = 0
    for s, g in zip(seeds, got):
        w = extend_seed_oracle(s["read"], s["rseq"], s["qbeg"], s["rbeg_off"], s["len"])
        if g != w:
            failures += 1
    print(
        f"{args.tasks} seeds in {dt*1e3:.1f}ms ({args.tasks/dt:.0f} seeds/s) "
        f"{'FAILED ' + str(failures) if failures else 'PASSED'}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
