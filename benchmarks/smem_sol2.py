#!/usr/bin/env python
"""SMEM speed-of-light, round 2: explain the isolated-vs-in-machine 3x.

Round 1 (smem_sol.py) measured the isolated serialized gather chain at
~13.1 ns/row, purely linear in row count after RTT correction — but the
machine's in-machine ablation says its fused 2B-row gather costs only
~4.6 ns/row.  Candidate mechanism: the machine's body runs UNROLL=4
(HOT=8 in multi-read mode) steps per while-loop iteration, which lets
XLA software-pipeline the dependent gathers' DMA issue with the
surrounding step work.  This harness isolates that.

Variants (B lanes, K total steps, table (200M/64, 8) int32 = 100 MB):
  dep_u1 / dep_u4 / dep_u8   serialized chain (addresses derived from
                             gathered data), unrolled 1/4/8 steps per
                             fori iteration
  indep                      addresses from an LCG, NOT from gathered
                             data (result accumulated so the gather
                             can't be DCE'd) — the pure THROUGHPUT wall
                             (latency fully hideable)
  pair16_u1 / pair16_u4      serialized chain of B rows from a
                             (nblk, 16) paired table (the coalesced-
                             probe candidate: one 64 B row serves both
                             occ probes when the pair spans <= 2
                             blocks; census says 74.7% do)

All timings are RTT-corrected: one empty-fetch round trip is measured
and subtracted from each call's wall before dividing by K.

Run on the real chip:  python benchmarks/smem_sol2.py [--b 65536]
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

SEQLEN = 200_000_000
K = 64


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=65536)
    args = ap.parse_args()
    B = args.b
    rng = np.random.default_rng(1)
    nrow = SEQLEN // 64
    tbl = jnp.asarray(rng.integers(0, 2**31 - 1, (nrow, 8), dtype=np.int32))
    tbl16 = jnp.asarray(
        rng.integers(0, 2**31 - 1, (nrow, 16), dtype=np.int32)
    )
    idx0 = jnp.asarray(rng.integers(0, nrow - 2, B, dtype=np.int32))
    MIX = np.uint32(0x9E3779B1).astype(np.int32)

    # --- RTT floor: fetch a scalar from a trivial jit -------------------
    triv = jax.jit(lambda x: x[0] + 1)
    triv(idx0).block_until_ready()
    rtt = 1e9
    for _ in range(5):
        t0 = time.time()
        float(triv(idx0))
        rtt = min(rtt, time.time() - t0)
    print(f"table (nrow={nrow}) 100 MB + paired 200 MB, lanes {B}, "
          f"K={K} steps, fetch RTT {rtt*1e3:.1f} ms", flush=True)

    def timed(fj, reps=3):
        fj(idx0).block_until_ready()
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            float(jnp.asarray(fj(idx0)).ravel()[0])
            best = min(best, time.time() - t0)
        return max(best - rtt, 1e-9) / K

    def report(name, dt, rows):
        print(f"{name:18s} {dt*1e6:8.1f} us/step  {rows/dt/1e6:7.1f} Mrows/s"
              f"  {rows*32/dt/1e9:6.2f} GB/s(32B-rows)  "
              f"{dt/rows*1e9:5.2f} ns/row", flush=True)

    # --- dependent chain at unroll u ------------------------------------
    def dep(u):
        def body(_, ka):
            for _ in range(u):
                kb = (ka + 977) % (nrow - 2)
                rows = jnp.take(tbl, jnp.concatenate([ka, kb]), axis=0)
                v = rows[:B, 0] + rows[B:, 1]
                ka = jnp.abs(ka * MIX + v) % (nrow - 2)
            return ka

        return jax.jit(lambda idx: jax.lax.fori_loop(0, K // u, body, idx))

    for u in (1, 4, 8):
        report(f"dep_u{u}", timed(dep(u)), 2 * B)

    # --- independent gathers: throughput wall ---------------------------
    def indep_f(idx):
        def body(c, carry):
            ka, acc = carry
            kb = (ka + 977) % (nrow - 2)
            rows = jnp.take(tbl, jnp.concatenate([ka, kb]), axis=0)
            acc = acc + rows[:B, 0] + rows[B:, 1]
            ka = (ka * 1103515245 + 12345 + c) % (nrow - 2)  # LCG, no dep
            return ka, acc

        _, acc = jax.lax.fori_loop(
            0, K, body, (idx, jnp.zeros((B,), jnp.int32))
        )
        return acc

    report("indep", timed(jax.jit(indep_f)), 2 * B)

    # --- paired-table candidate: B rows of 16 int32 ---------------------
    def pair16(u):
        def body(_, ka):
            for _ in range(u):
                rows = jnp.take(tbl16, ka, axis=0)
                v = rows[:, 0] + rows[:, 9]
                ka = jnp.abs(ka * MIX + v) % (nrow - 2)
            return ka

        return jax.jit(lambda idx: jax.lax.fori_loop(0, K // u, body, idx))

    for u in (1, 4):
        report(f"pair16_u{u}", timed(pair16(u)), B)


if __name__ == "__main__":
    main()
