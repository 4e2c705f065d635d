#!/usr/bin/env python
"""Fast SMEM machine-vs-oracle exactness check (CPU, ~1-2 min).

The dev loop for state-machine surgery: adversarial read mix (sampled,
errored, low-complexity, repeat-heavy, N-laden, short) against the NumPy
oracle, exact interval compare, on a small genome.  Prints machine
iteration counts so iteration-reduction work is visible immediately.

Usage: python benchmarks/smem_dev_check.py [--genome 50000] [--reads 96]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from acc_genomics_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()  # kernel/machine bodies are multi-minute cold compiles


def make_reads(rng, genome, n, read_len=101):
    from acc_genomics_tpu.io.synth import gen_smem_reads

    reads = gen_smem_reads(rng, genome, max(n - 24, 1), read_len=read_len)
    # adversarial extras: low-complexity, homopolymer, dimer repeats,
    # random (unmappable), heavy-N, short, full-N
    g = len(genome)
    extras = [
        np.zeros(read_len, np.uint8),                       # poly-A
        np.tile([0, 1], read_len // 2 + 1)[:read_len].astype(np.uint8),
        np.tile([0, 1, 2, 3], read_len // 4 + 1)[:read_len].astype(np.uint8),
        rng.integers(0, 4, read_len).astype(np.uint8),      # random
        rng.integers(0, 5, read_len).astype(np.uint8),      # ~20% N
        genome[: read_len // 3].copy(),                     # short sampled
        np.full(read_len, 4, np.uint8),                     # all N
        np.concatenate([genome[:40], genome[g // 2 : g // 2 + 40],
                        genome[:21]]).astype(np.uint8),     # chimeric
    ]
    # tandem repeat read: motif from the genome repeated
    motif = genome[100:125]
    extras.append(np.tile(motif, read_len // len(motif) + 1)[:read_len].astype(np.uint8))
    for e in extras:
        reads.append(e)
    while len(reads) < n:
        reads.append(gen_smem_reads(rng, genome, 1, read_len=read_len)[0])
    return reads[:n]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome", type=int, default=50_000)
    ap.add_argument("--reads", type=int, default=96)
    ap.add_argument("--read-len", type=int, default=101)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    if jax.default_backend() != "cpu":
        pass  # allow running on TPU too

    from acc_genomics_tpu.io.synth import gen_reference_with_repeats
    from acc_genomics_tpu.ops.smem.index import FMIndex
    from acc_genomics_tpu.ops.smem.machine import smem_batch_machine
    from acc_genomics_tpu.ops.smem.reference import (
        DEFAULT_SMEM_PARAMS,
        mem_collect_intv_oracle,
    )

    rng = np.random.default_rng(args.seed)
    genome = gen_reference_with_repeats(rng, args.genome, repeat_len=60, n_repeats=12)
    fm = FMIndex.build(genome)
    reads = make_reads(rng, genome, args.reads, args.read_len)

    t0 = time.time()
    got, ovf, iters = smem_batch_machine(fm, reads, seq_len=128)
    dt = time.time() - t0

    canon = lambda z: sorted(
        (i["x0"], i["x1"], i["s"], i["start"], i["end"]) for i in z
    )
    n_ovf, n_bad = 0, 0
    for k, r in enumerate(reads):
        want = mem_collect_intv_oracle(fm, r, DEFAULT_SMEM_PARAMS)
        if ovf[k]:
            n_ovf += 1
            if len(want) <= DEFAULT_SMEM_PARAMS.max_intv_alloc:
                # bust lane (engine would host-rerun); acceptable but count
                pass
            continue
        if canon(got[k]) != canon(want):
            n_bad += 1
            print(f"MISMATCH read {k}: got {canon(got[k])[:4]} want {canon(want)[:4]}")
    print(
        f"reads={len(reads)} iters={iters} overflow/bust={n_ovf} "
        f"mismatches={n_bad} ({dt:.1f}s device+host)"
    )
    if n_bad:
        sys.exit(1)
    print("EXACT")


if __name__ == "__main__":
    main()
