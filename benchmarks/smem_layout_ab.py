#!/usr/bin/env python
"""SMEM machine microbench at genome scale (raw machine loop, no engine).

Historically this harness A/B'd probe-table layouts (i32x8 / f32x8 /
i64x4 — identical bits, different HBM dtype/shape); the sweep concluded
NEGATIVE (f32x8 bitcast identical, i64x4 slower, padded 64-B rows
slower — PERF_NOTES "SMEM round-3 findings") and the layout knob was
removed.  What remains is the useful core: time the machine loop on a
cached index
regions, and report reads/s + step cost.

  python benchmarks/smem_layout_ab.py [--npz data/chr100m.fm.npz]
      [--reads 65536]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from acc_genomics_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()  # kernel/machine bodies are multi-minute cold compiles

import jax.numpy as jnp

from acc_genomics_tpu.io.synth import gen_smem_reads
from acc_genomics_tpu.ops.smem.index import FMIndex
from acc_genomics_tpu.ops.smem.machine import _collect_jit, device_index_fused


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", default="data/chr100m.fm.npz")
    ap.add_argument("--reads", type=int, default=65536)
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

    idx = device_index_fused(fm)
    mem, mem_n, iters = _collect_jit(idx, seq_tm_j, lens_j)  # warm/compile
    np.asarray(mem_n)
    reps, best = 3, 1e9
    for _ in range(reps):
        t0 = time.time()
        mem, mem_n, iters = _collect_jit(idx, seq_tm_j, lens_j)
        np.asarray(mem_n)
        best = min(best, time.time() - t0)
    it = int(np.asarray(iters))
    print(
        f"machine: {B/best:.0f} reads/s, "
        f"{best*1e3:.0f} ms/batch, {it} steps, {best/it*1e6:.0f} us/step"
    )


if __name__ == "__main__":
    main()
