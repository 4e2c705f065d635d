#!/usr/bin/env python
"""Round 3 of the probe-gather layout study (gather_ab.py, gather_ab2.py).

Question for the round-4 SMEM push: the machine's per-step cost at
genome scale is ~73% the fused occ-row gather (2B rows x 8 int32).  If
gather cost scales with ELEMENTS, shrinking the occ row to 4 int32
(occ interval 64 -> 16: 3 checkpoint counts + 1 packed word, the 4th
count derived from 16*blk - c0 - c1 - c2) halves the gather.  If it is
per-ROW, the redesign buys nothing.  Earlier rounds only tested int64
repacks of the same 32 bytes — never narrower int32 rows.

Variants (all 2 spread probes/step, serialized chain, B production
size): row widths 2/4/6/8 int32 at matching realistic table row counts
(narrower occ interval = proportionally more rows).
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

B = 65536
K = 64
SEQLEN = 200_000_000  # 100 Mbp fwd+rc


def bench(name, tbl, width):
    nrow = tbl.shape[0]

    def f(idx):
        def body(_, c):
            acc = 0
            for g in range(2):
                r = jnp.take(tbl, (c + g * 1013) % (nrow - 2), axis=0)
                acc = acc + r[:, 0]
            return (c + acc) % (nrow - 2)

        return jax.lax.fori_loop(0, K, body, idx)

    fj = jax.jit(f)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, nrow - 2, B, dtype=np.int32)
    )
    fj(idx).block_until_ready()
    reps = 3
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        float(fj(idx)[0])
        best = min(best, (time.time() - t0) / K)
    per_elem = best / (B * 2 * width) * 1e9
    print(f"{name:40s} {best*1e6:9.1f} us/step  {per_elem:6.2f} ns/elem")
    return best


def main():
    rng = np.random.default_rng(1)
    print(f"lanes {B}, {K} serialized steps, 2 spread probes/step")
    for occ, width in ((64, 8), (32, 5), (16, 4), (16, 2)):
        nrow = SEQLEN // occ
        tbl = jnp.asarray(
            rng.integers(0, 2**31 - 1, (nrow, width), dtype=np.int32)
        )
        bench(f"occ{occ}: int32 ({nrow},{width}) rows", tbl, width)
        del tbl


if __name__ == "__main__":
    main()


def bench_hotfrac():
    """Does index locality matter?  Fraction of lanes pinned to row 0
    (the DONE/bookkeeping-lane trick) vs fully random indices."""
    rng = np.random.default_rng(1)
    nrow = SEQLEN // 64
    tbl = jnp.asarray(rng.integers(0, 2**31 - 1, (nrow, 8), dtype=np.int32))

    for frac in (0.0, 0.5, 0.8, 1.0):
        nz = int(B * frac)

        def f(idx):
            def body(_, c):
                acc = 0
                for g in range(2):
                    k = (c + g * 1013) % (nrow - 2)
                    if nz:
                        mask = (
                            jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
                            .squeeze(-1) < nz
                        )
                        k = jnp.where(mask, 0, k)
                    acc = acc + jnp.take(tbl, k, axis=0)[:, 0]
                return (c + acc) % (nrow - 2)

            return jax.lax.fori_loop(0, K, body, idx)

        fj = jax.jit(f)
        idx = jnp.asarray(
            np.random.default_rng(0).integers(0, nrow - 2, B, dtype=np.int32)
        )
        fj(idx).block_until_ready()
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            float(fj(idx)[0])
            best = min(best, (time.time() - t0) / K)
        print(f"hot-row fraction {frac:4.1f}  {best*1e6:9.1f} us/step")
