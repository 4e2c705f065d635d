#!/usr/bin/env python
"""A/B the SMEM probe-table layout in the REAL machine at genome scale.

Runs smem_collect_machine on the cached 100 Mbp index with each probe
layout (identical bits, different HBM dtype/shape), checks the outputs
are exactly equal, and reports reads/s.  The microbench in gather_ab.py
was unstable because XLA's gather-slice optimization consumed different
fractions of each variant; the machine consumes every gathered byte.

  python benchmarks/smem_layout_ab.py [--npz data/chr100m.fm.npz] [--reads 16384]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)  # for the i64x4 variant

import jax.numpy as jnp

from acc_genomics_tpu.io.synth import gen_smem_reads
from acc_genomics_tpu.ops.smem.index import FMIndex
from acc_genomics_tpu.ops.smem.machine import _collect_jit, device_index_fused


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", default="data/chr100m.fm.npz")
    ap.add_argument("--reads", type=int, default=16384)
    ap.add_argument("--read-len", type=int, default=101)
    ap.add_argument("--layouts", default="i32x8,f32x8,i64x4")
    args = ap.parse_args()

    t0 = time.time()
    fm = FMIndex.load(args.npz)
    print(f"index loaded in {time.time()-t0:.1f}s ({fm.seq_len} entries)")
    rng = np.random.default_rng(0)
    genome = fm.text[: fm.seq_len // 2]
    reads = gen_smem_reads(rng, genome, args.reads, read_len=args.read_len)
    B = len(reads)
    L = args.read_len
    seq_tm = np.full((128, B), 4, np.uint8)
    lens = np.zeros(B, np.int32)
    for k, r in enumerate(reads):
        seq_tm[: len(r), k] = r
        lens[k] = len(r)
    seq_tm_j = jnp.asarray(seq_tm)
    lens_j = jnp.asarray(lens)

    ref = None
    for layout in args.layouts.split(","):
        idx = device_index_fused(fm, layout=layout)
        mem, mem_n, iters = _collect_jit(idx, seq_tm_j, lens_j)  # warm
        got = jax.device_get((jnp.stack(mem), mem_n, iters))
        if ref is None:
            ref = got
            print(f"iters={int(got[2])}")
        else:
            assert np.array_equal(ref[0], got[0]), f"{layout}: mem mismatch"
            assert np.array_equal(ref[1], got[1]), f"{layout}: mem_n mismatch"
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            mem, mem_n, iters = _collect_jit(idx, seq_tm_j, lens_j)
        jax.device_get(mem_n)
        dt = (time.time() - t0) / reps
        print(f"{layout:8s} {dt:7.3f} s/batch  {B/dt:9.0f} reads/s  "
              f"{dt/int(got[2])*1e6:8.1f} us/machine-iter")
        del idx


if __name__ == "__main__":
    main()
