"""SW fill kernel GCUPS at a fixed 288x288 shape (HTC canonical ~286bp)."""
import time
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from acc_genomics_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()  # kernel/machine bodies are multi-minute cold compiles

import numpy as np
import jax
import jax.numpy as jnp

from acc_genomics_tpu.ops.sw.kernel import DMA_GROUP, LANES, sw_fill_pallas


def main(B=1024, rl=288, al=288, K=20):
    rng = np.random.default_rng(0)
    rows, D = rl, rl + al
    ref_tm = rng.integers(0, 4, (rows, B)).astype(np.int32)
    alt_ext = np.full((D, B), 255, np.int32)
    alt_ext[:al] = rng.integers(0, 4, (al, B))
    reflen = np.full((B,), rl, np.int32)
    altlen = np.full((B,), al, np.int32)
    nd = rows + altlen.reshape(-1, LANES).max(axis=1)
    bd = jnp.asarray(
        np.minimum((nd + DMA_GROUP - 1) // DMA_GROUP * DMA_GROUP, D).astype(np.int32)
    )
    args = [jnp.asarray(x) for x in (ref_tm, alt_ext, reflen, altlen)]

    def run_k(k):
        a, out = args[0], None
        for _ in range(k):
            _, lr, out = sw_fill_pallas(a, args[1], args[2], args[3], 0, bd)
            a = a + lr[:rows].astype(jnp.int32) % 2  # chain dependency
        return a, out

    r = run_k(1)
    jax.block_until_ready(r)
    jax.device_get(r[1][:1, :1])
    t0 = time.perf_counter()
    r = run_k(K)
    jax.device_get(r[1][:1, :1])
    dt = (time.perf_counter() - t0) / K
    print(f"sw_fill: {dt*1e3:.2f} ms  {B*rl*al/dt/1e9:.2f} GCUPS ({B}x{rl}x{al})")


if __name__ == "__main__":
    main()
