#!/usr/bin/env python
"""A/B the fused two-probe gather in the REAL machine at genome scale.

Each machine iteration needs occ4 at two positions per lane (interval
head k-1 and tail k-1+s).  Variant A issues two (B,)-index row gathers;
variant B concatenates to one (2B,)-index gather.  Total bytes moved are
identical — this measures whether the TPU gather cost is per-invocation
or per-row.  Results checked exactly equal between variants.

  python benchmarks/smem_fused_probe_ab.py [--npz data/chr100m.fm.npz]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from acc_genomics_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()  # kernel/machine bodies are multi-minute cold compiles

import jax
import jax.numpy as jnp

from acc_genomics_tpu.io.synth import gen_smem_reads
from acc_genomics_tpu.ops.smem.index import FMIndex
from acc_genomics_tpu.ops.smem import machine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", default="data/chr100m.fm.npz")
    ap.add_argument("--reads", type=int, default=16384)
    ap.add_argument("--read-len", type=int, default=101)
    args = ap.parse_args()

    t0 = time.time()
    fm = FMIndex.load(args.npz)
    print(f"index loaded in {time.time()-t0:.1f}s ({fm.seq_len} entries)")
    rng = np.random.default_rng(0)
    genome = fm.text[: fm.seq_len // 2]
    reads = gen_smem_reads(rng, genome, args.reads, read_len=args.read_len)
    B = len(reads)
    seq_tm = np.full((128, B), 4, np.uint8)
    lens = np.zeros(B, np.int32)
    for k, r in enumerate(reads):
        seq_tm[: len(r), k] = r
        lens[k] = len(r)
    seq_tm_j = jnp.asarray(seq_tm)
    lens_j = jnp.asarray(lens)
    idx = machine.device_index_fused(fm)

    ref = None
    for fused in (False, True):
        machine.FUSED_PROBE = fused
        fn = jax.jit(machine.smem_collect_machine,
                     static_argnames=("max_iters", "params"))
        mem, mem_n, iters = fn(idx, seq_tm_j, lens_j)  # warm/compile
        got = jax.device_get((jnp.stack(mem), mem_n, iters))
        if ref is None:
            ref = got
            print(f"iters={int(got[2])}")
        else:
            assert np.array_equal(ref[0], got[0]), "mem mismatch"
            assert np.array_equal(ref[1], got[1]), "mem_n mismatch"
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            mem, mem_n, iters = fn(idx, seq_tm_j, lens_j)
        jax.device_get(mem_n)
        dt = (time.time() - t0) / reps
        name = "fused-1-gather" if fused else "two-gathers   "
        print(f"{name} {dt:7.3f} s/batch  {B/dt:9.0f} reads/s  "
              f"{dt/int(got[2])*1e6:8.1f} us/machine-iter")


if __name__ == "__main__":
    main()
