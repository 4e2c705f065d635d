#!/usr/bin/env python
"""A/B: difficulty-sorted batch composition at 100 Mbp.

The one-shot machine is bound by its MAX-iteration lane (mean live steps
~630, max ~1357 — 54% DONE-wait).  In-loop compaction and streaming
refill both lost (PERF_NOTES), but batch COMPOSITION is free: if a cheap
per-read difficulty proxy (k-mer occurrence counts from a host-side
table) predicts machine steps, sorting a multi-batch workload makes
every batch's max ~= its own mean and the total step count approaches
the sorted prefix sums instead of n_batches x global max.

Proxy: max (and sum) of 12-mer occurrence counts sampled along the read
(repeat-heavy reads = high counts = long back/reseed chains).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from acc_genomics_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()  # kernel/machine bodies are multi-minute cold compiles

import jax
import jax.numpy as jnp

from acc_genomics_tpu.engine.smem_engine import SmemEngine
from acc_genomics_tpu.config import SmemConfig
from acc_genomics_tpu.io.synth import gen_smem_reads
from acc_genomics_tpu.ops.smem.index import FMIndex
from acc_genomics_tpu.ops.smem.machine import _collect_jit

K = 12


def kmer_table(text):
    t0 = time.time()
    code = np.zeros(len(text) - K + 1, np.int64)
    for j in range(K):
        code <<= 2
        code |= text[j : len(text) - K + 1 + j].astype(np.int64)
    cnt = np.bincount(code, minlength=4**K).astype(np.int32)
    print(f"12-mer table: {time.time()-t0:.1f}s, {cnt.nbytes/1e6:.0f} MB")
    return cnt


def scores(reads_tm, lens, cnt):
    """reads time-major (L, B) uint8 -> per-lane difficulty score."""
    B = reads_tm.shape[1]
    L = reads_tm.shape[0]
    code = np.zeros((L - K + 1, B), np.int64)
    for j in range(K):
        code <<= 2
        code |= reads_tm[j : L - K + 1 + j].astype(np.int64)
    sample = code[:: 8]  # every 8th position
    c = cnt[np.clip(sample, 0, len(cnt) - 1)]
    return c.sum(axis=0), c.max(axis=0)


def run_batches(idx, seq, lens, params, order, nb, B):
    total, iters_all = 0.0, []
    for b in range(nb):
        sel = order[b * B : (b + 1) * B]
        s = jnp.asarray(seq[:, sel])
        ln = jnp.asarray(lens[sel])
        # warm (compile shared across batches — same shape)
        if b == 0:
            _collect_jit(idx, s, ln, params=params)
        t0 = time.perf_counter()
        _, mem_n, iters = _collect_jit(idx, s, ln, params=params)
        jax.device_get(mem_n)
        total += time.perf_counter() - t0
        iters_all.append(int(jax.device_get(jnp.asarray(iters))))
    return total, iters_all


def main():
    fm = FMIndex.load("data/chr100m.fm.npz")
    cfg = SmemConfig()
    eng = SmemEngine(fm, cfg)
    B, nb = 65536, 4
    N = B * nb
    rng = np.random.default_rng(0)
    genome = fm.text[: fm.seq_len // 2]
    reads = gen_smem_reads(rng, genome, N, read_len=101)
    seq = np.full((128, N), 4, np.uint8)
    lens = np.zeros(N, np.int32)
    for k, r in enumerate(reads):
        seq[: len(r), k] = r
        lens[k] = len(r)

    cnt = kmer_table(fm.text)
    t0 = time.time()
    ssum, smax = scores(seq, lens, cnt)
    print(f"scoring {N} reads: {time.time()-t0:.1f}s")

    ident = np.arange(N)
    t_un, it_un = run_batches(eng.idx, seq, lens, eng.params, ident, nb, B)
    print(f"unsorted: {t_un*1e3:.0f} ms  iters={it_un}  "
          f"{N/t_un/1e3:.1f}K reads/s")
    for name, sc in (("sum", ssum), ("max", smax)):
        order = np.argsort(sc, kind="stable")
        t_s, it_s = run_batches(eng.idx, seq, lens, eng.params, order, nb, B)
        print(f"sorted({name}): {t_s*1e3:.0f} ms  iters={it_s}  "
              f"{N/t_s/1e3:.1f}K reads/s  ({t_un/t_s:.2f}x)")


if __name__ == "__main__":
    main()
