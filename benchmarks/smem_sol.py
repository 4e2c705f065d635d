#!/usr/bin/env python
"""SMEM speed-of-light: the random-row gather WALL at genome scale.

The machine's per-step cost at 100 Mbp is dominated by ONE fused probe
gather — 2B rows x 32 B from the (3.1M, 8) int32 occ table (77% of the
727 us one-shot step by the round-4 nogather ablation).  The round-4
verdict asked for the ceiling itself: what does the cheapest possible
while_loop cost that issues the SAME gather with the SAME serialized
dependency (next addresses derived from gathered data) and nothing
else?  machine_step / wall_step is then the honest speed-of-light
fraction, the analog of the PairHMM kernel's VPU-rate argument
(PERF_NOTES "PairHMM kernel speed-of-light check").

Variants (B = 65536 lanes, K serialized steps, table (200M/64, 8) i32):
  wall_fused   one take of 2B rows (the machine's exact probe shape)
  wall_occ     wall_fused + the full _occ4_from_row popcount arithmetic
  wall_B       one take of B rows (row-count scaling)
  wall_4B      one take of 4B rows (row-count scaling, up)
  dup_pair     kb == ka: every fused pair hits the SAME row — measures
               same-address serialization for the near-interval case
               (small s puts both probes of one lane in one 64-block;
               relevant to the Q=16 live-lane anomaly)
  near_pair    kb = ka + 1: adjacent rows, no duplication
  stream       contiguous block read of the same bytes/step (DMA-shaped
               reference point: what the bytes would cost if streamed)

Run on the real chip:  python benchmarks/smem_sol.py [--b 65536]
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

SEQLEN = 200_000_000  # 100 Mbp fwd+rc
K = 64


def timed_loop(fj, idx, reps=3):
    fj(idx).block_until_ready()
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        float(jnp.asarray(fj(idx)).ravel()[0])
        best = min(best, (time.time() - t0) / K)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=65536)
    args = ap.parse_args()
    B = args.b
    rng = np.random.default_rng(1)
    nrow = SEQLEN // 64
    tbl = jnp.asarray(rng.integers(0, 2**31 - 1, (nrow, 8), dtype=np.int32))
    idx0 = jnp.asarray(rng.integers(0, nrow - 2, B, dtype=np.int32))
    print(f"table ({nrow}, 8) int32 = {nrow*32/1e6:.0f} MB, lanes {B}, "
          f"{K} serialized steps")

    MIX = np.uint32(0x9E3779B1).astype(np.int32)  # golden-ratio mix, wrapped

    def chain(body):
        def f(idx):
            return jax.lax.fori_loop(0, K, body, idx)
        return jax.jit(f)

    rows_per = {"wall_fused (2B rows)": 2 * B, "wall_occ (2B rows + occ4)": 2 * B,
                "wall_B (B rows)": B, "wall_4B (4B rows)": 4 * B,
                "dup_pair (kb == ka)": 2 * B, "near_pair (kb = ka+1)": 2 * B,
                "stream (same bytes, contiguous)": 2 * B}
    results = {}

    def report(name, dt):
        results[name] = dt
        r = rows_per[name]
        print(f"{name:34s} {dt*1e6:8.1f} us/step  "
              f"{r/dt/1e6:7.1f} Mrows/s  {r*32/dt/1e9:6.2f} GB/s",
              flush=True)

    # --- wall_fused: the machine's exact probe shape --------------------
    def body_fused(_, ka):
        kb = (ka + 977) % (nrow - 2)
        rows = jnp.take(tbl, jnp.concatenate([ka, kb]), axis=0)
        v = rows[:B, 0] + rows[B:, 1]
        return jnp.abs(ka * MIX + v) % (nrow - 2)

    report("wall_fused (2B rows)", timed_loop(chain(body_fused), idx0))

    # --- wall_occ: + the real occ arithmetic ----------------------------
    from acc_genomics_tpu.ops.smem.machine import _occ4_from_row

    def body_occ(_, ka):
        kb = (ka + 977) % (nrow - 2)
        kk = jnp.concatenate([ka, kb])
        rows = jnp.take(tbl, kk, axis=0)
        occ = _occ4_from_row(rows, kk % 64, kk >= 0)
        v = occ[:B, 0] + occ[B:, 3]
        return jnp.abs(ka * MIX + v) % (nrow - 2)

    report("wall_occ (2B rows + occ4)", timed_loop(chain(body_occ), idx0))

    # --- row-count scaling ----------------------------------------------
    def body_B(_, ka):
        rows = jnp.take(tbl, ka, axis=0)
        return jnp.abs(ka * MIX + rows[:, 0]) % (nrow - 2)

    report("wall_B (B rows)", timed_loop(chain(body_B), idx0))

    def body_4B(_, ka):
        kk = jnp.concatenate(
            [ka, (ka + 977) % (nrow - 2), (ka + 3989) % (nrow - 2),
             (ka + 7919) % (nrow - 2)]
        )
        rows = jnp.take(tbl, kk, axis=0)
        v = rows[:B, 0] + rows[B : 2 * B, 1] + rows[2 * B : 3 * B, 2] + rows[3 * B :, 3]
        return jnp.abs(ka * MIX + v) % (nrow - 2)

    report("wall_4B (4B rows)", timed_loop(chain(body_4B), idx0))

    # --- duplicate / near pair (the fused pair's address patterns) ------
    def body_dup(_, ka):
        rows = jnp.take(tbl, jnp.concatenate([ka, ka]), axis=0)
        v = rows[:B, 0] + rows[B:, 1]
        return jnp.abs(ka * MIX + v) % (nrow - 2)

    report("dup_pair (kb == ka)", timed_loop(chain(body_dup), idx0))

    def body_near(_, ka):
        rows = jnp.take(tbl, jnp.concatenate([ka, ka + 1]), axis=0)
        v = rows[:B, 0] + rows[B:, 1]
        return jnp.abs(ka * MIX + v) % (nrow - 2)

    report("near_pair (kb = ka+1)", timed_loop(chain(body_near), idx0))

    # --- streamed reference: same bytes, contiguous ---------------------
    blk = 2 * B * 8  # elements/step the fused gather touches
    flat = tbl.reshape(-1)

    def body_stream(_, ka):
        off = (ka[0] % 997).astype(jnp.int32) * 0  # keep dependency shape
        seg = jax.lax.dynamic_slice(flat, (off,), (blk,))
        return jnp.abs(ka * MIX + seg[:B]) % (nrow - 2)

    report("stream (same bytes, contiguous)", timed_loop(
        chain(body_stream), idx0
    ))



if __name__ == "__main__":
    main()
