#!/usr/bin/env python
"""Real-machine SMEM A/B at genome scale (100 Mbp cached index).

Microbenches of the probe gather mislead (gather_ab3: an isolated
serialized gather chain measures ~3x the cost the same gather shows
inside the machine, and hot-row duplication SLOWS gathers via bank
conflicts), so every round-4 lever is A/B'd here, inside the actual
machine, on the cached data/chr100m.fm.npz.

Variants (--variant):
  base      one-shot split-body machine (production path)
  unified   all three passes in ONE body (no p12/p3 barrier): segment
            machine with one huge segment

--probe-extra {none,self,rand,near} (round 5, speed-of-light): add a
SECOND 2B-row gather to every machine step, patched into _occ4_pair:
  self  at the probe's own block addresses (identical distribution) —
        the step-cost delta is the in-machine MARGINAL cost of the
        machine's real gather, the number the isolated chains
        (smem_sol.py: 13.0 ns/row throughput-bound) kept contradicting
  rand  at hash-scrambled block addresses (uniform random) — if this
        delta exceeds the self delta, the real probe's address
        DISTRIBUTION is what the isolated microbenches failed to model
  near  at block+1 (adjacent-row control)
The extra rows are folded into the occ output via XOR of their low bits
(so XLA cannot DCE or hoist them); occ values are then off by <= 1
occasionally, which perturbs the walk — compare us/step, not results.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

# persistent compile cache (same as bench.py): variants differ by static
# shape knobs, each a multi-minute cold compile on the machine body
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from acc_genomics_tpu.config import SmemConfig
from acc_genomics_tpu.engine.smem_engine import SmemEngine
from acc_genomics_tpu.io.synth import gen_smem_reads
from acc_genomics_tpu.ops.smem.index import FMIndex


def make_batch(fm, B, read_len=101, seed=0):
    rng = np.random.default_rng(seed)
    genome = fm.text[: fm.seq_len // 2]
    reads = gen_smem_reads(rng, genome, B, read_len=read_len)
    seq_tm = np.full((128, B), 4, np.uint8)
    lens = np.zeros(B, np.int32)
    for k, r in enumerate(reads):
        seq_tm[: len(r), k] = r
        lens[k] = len(r)
    return jnp.asarray(seq_tm), jnp.asarray(lens)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", default="data/chr100m.fm.npz")
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--variant", default="base")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--curr-cap", type=int, default=None)
    ap.add_argument("--mem-cap", type=int, default=None)
    ap.add_argument("--probe-extra", default="none",
                    choices=["none", "self", "rand", "near"])
    ap.add_argument("--qmax", type=int, default=None,
                    help="max_reads_per_lane for the multi variants "
                    "(the engine default is 8; Q=16 was last measured "
                    "PRE-state-folds at +110 us/step)")
    args = ap.parse_args()

    if args.probe_extra != "none":
        import acc_genomics_tpu.ops.smem.machine as M

        orig_pair = M._occ4_pair
        MIX = np.uint32(0x9E3779B1).astype(np.int32)

        def patched(tbl, primary, ka, kb):
            o_a, o_b = orig_pair(tbl, primary, ka, kb)
            nblk = tbl.shape[0]
            kk = jnp.concatenate([ka, kb])
            blk = jnp.maximum(kk - (kk >= primary).astype(jnp.int32), 0) // 64
            if args.probe_extra == "self":
                blk2 = blk
            elif args.probe_extra == "near":
                blk2 = jnp.minimum(blk + 1, nblk - 1)
            else:  # rand
                blk2 = jnp.abs(kk * MIX) % (nblk - 1)
            rows = jnp.take(tbl, blk2, axis=0)
            B = ka.shape[0]
            # rare (p = 1/16) low-bit flips: un-DCE-able, walk stays close
            flip = ((rows & 0xF) == 0xF).astype(o_a.dtype)
            return o_a ^ flip[:B, :4], o_b ^ flip[B:, :4]

        M._occ4_pair = patched

    fm = FMIndex.load(args.npz)
    kw = {}
    if args.curr_cap is not None:
        kw["curr_cap"] = args.curr_cap
    if args.mem_cap is not None:
        kw["mem_cap"] = args.mem_cap
    if args.qmax is not None:
        kw["max_reads_per_lane"] = args.qmax
    cfg = SmemConfig(batch_size=args.batch, **kw)
    eng = SmemEngine(fm, cfg)
    seq, lens = make_batch(fm, args.batch)

    if args.variant == "base":
        from acc_genomics_tpu.ops.smem.machine import _collect_jit

        # perturbed-probe walks may not converge: cap iterations so the
        # per-step cost is still measured over a bounded, comparable run
        mi = 2000 if args.probe_extra != "none" else None

        def run():
            mem, mem_n, iters = _collect_jit(
                eng.idx, seq, lens, max_iters=mi, params=eng.params
            )
            return jax.device_get((mem_n, jnp.asarray(iters)))

    elif args.variant.startswith("multi"):
        # multi-read machine through the engine path: --variant multi4
        # runs Q=4 (batch reads = Q * lane batch through collect_arrays)
        q = int(args.variant[5:] or 4)
        seq_w, lens_w = make_batch(fm, args.batch * q)
        seq_np, lens_np = np.asarray(seq_w), np.asarray(lens_w)

        def run():
            eng.stats["probe_iters"] = 0
            _, mem_n, ovf = eng.collect_arrays(seq_np, lens_np)
            return mem_n * 0 + (ovf.sum() > eng.params.max_intv_alloc), eng.stats["probe_iters"]

    else:
        raise SystemExit(f"unknown variant {args.variant}")

    n_work = (
        args.batch * int(args.variant[5:] or 4)
        if args.variant.startswith("multi") else args.batch
    )
    mem_n, it0 = run()  # compile + warm
    best, iters = 1e9, 0
    for _ in range(args.reps):
        t0 = time.perf_counter()
        _, iters = run()
        best = min(best, time.perf_counter() - t0)
    print(
        f"{args.variant:8s} B={args.batch} n={n_work} caps="
        f"{eng.params.curr_cap}/{eng.params.mem_cap}: "
        f"{best*1e3:.0f} ms  {n_work/best/1e3:.1f}K reads/s  "
        f"iters={int(iters)}  {best/max(int(iters),1)*1e6:.0f} us/step"
    )


if __name__ == "__main__":
    main()
