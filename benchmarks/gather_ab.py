#!/usr/bin/env python
"""A/B the SMEM probe-gather cost on the real chip.

The SMEM machine's per-iteration cost at genome scale is bounded by the
batched occ-row gather (PERF_NOTES: ~2.6 ns/element on a 3.1M-row
table).  This measures, per probe and per lane, the serialized cost of
several candidate probe layouts so the machine can pick the cheapest:

  a) two (B,) gathers of (8,) int32 rows  — the current layout
  b) two (B,) gathers of (4,) int64 rows  — same bytes, half the elements
  c) one  (B,) gather of (16,) int32 rows — paired-row probe (both occ
     lookups in one gather when l lands in blk(k) or blk(k)+1)
  d) one  (B,) gather of (8,) int64 rows  — paired-row + int64
  e) one  (B,) gather of (4,) int32 text words — the unique-interval
     text-mode probe (16 bases per lane per step)
  f) one  (B,) gather of (1,) int32       — minimal (ISA lookup cost)

Each step's indices depend on the previous gather (serialized chain), K
steps per jit, one device fetch — the tunnel-safe timing recipe.
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

NBLK = 3_125_000  # ~100 Mbp fused table rows (2e8 / 64)
B = 16384
K = 64


def chain(tbl, n_gather, rows_per_gather):
    nblk = tbl.shape[0]

    def f(idx):
        def body(_, c):
            acc = c * 0
            for g in range(n_gather):
                base = (c + g * 1013) % (nblk - rows_per_gather)
                if rows_per_gather == 1:
                    row = jnp.take(tbl, base, axis=0)
                else:
                    rows = [jnp.take(tbl, base + r, axis=0) for r in range(rows_per_gather)]
                    row = jnp.concatenate(rows, axis=-1)
                acc = acc + row[..., 0].astype(jnp.int32)
            return (c + acc) % nblk

        return jax.lax.fori_loop(0, K, body, idx)

    return jax.jit(f)


def run(name, tbl, n_gather, elems, rows_per_gather=1):
    idx = jnp.asarray(np.random.default_rng(0).integers(0, NBLK - 2, B, dtype=np.int32))
    f = chain(tbl, n_gather, rows_per_gather)
    out = f(idx)
    out.block_until_ready()
    reps = 3
    t0 = time.time()
    r = idx
    for _ in range(reps):
        r = f(r)
    float(r[0])  # force one fetch
    dt = (time.time() - t0) / (reps * K)
    per_elem = dt / (B * elems) * 1e9
    print(f"{name:34s} {dt*1e6:9.1f} us/step  {per_elem:6.2f} ns/elem "
          f"({elems} elem/lane/step)")
    return dt


def main():
    rng = np.random.default_rng(1)
    t32 = jnp.asarray(rng.integers(0, 2**31 - 1, (NBLK, 8), dtype=np.int32))
    t64 = jax.lax.bitcast_convert_type(t32.reshape(NBLK, 4, 2), jnp.int64)
    txt = jnp.asarray(rng.integers(0, 2**31 - 1, (NBLK, 4), dtype=np.int32))
    one = jnp.asarray(rng.integers(0, 2**31 - 1, (NBLK * 8,), dtype=np.int32))
    print(f"table rows {NBLK}, lanes {B}, chain {K} serialized steps/jit")
    run("a) 2x int32 (8,) rows [current]", t32, 2, 16)
    run("b) 2x int64 (4,) rows", t64, 2, 8)
    run("c) 1x int32 (16,) paired rows", t32, 1, 16, rows_per_gather=2)
    run("d) 1x int64 (8,) paired rows", t64, 1, 8, rows_per_gather=2)
    run("e) 1x int32 (4,) text words", txt, 1, 4)
    run("f) 1x int32 scalar (ISA)", one, 1, 1)


if __name__ == "__main__":
    jax.config.update("jax_enable_x64", True)
    main()
