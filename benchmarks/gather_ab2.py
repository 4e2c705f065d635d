#!/usr/bin/env python
"""Round 2 of the probe-gather layout study (see gather_ab.py).

Finding from round 1: two spread 8-int32-row gathers cost ~4.6 ms/step
at B=16384 on a 3.1M-row table while the same bytes as int64 rows cost
~0.5 ms — layout, not element count, dominates.  This run separates the
serialization floor from marginal gather cost and sweeps layouts:
every variant delivers the same 32 bytes/lane/probe, 2 probes/step.
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

NBLK = 3_125_000
B = 16384
K = 64


def bench(name, make_step, n_probe=2):
    """make_step(c) -> (payload_i32_(B,), ...) serialized via payload."""

    def f(idx):
        def body(_, c):
            acc = make_step(c)
            return (c + acc) % (NBLK - 2)

        return jax.lax.fori_loop(0, K, body, idx)

    fj = jax.jit(f)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, NBLK - 2, B, dtype=np.int32)
    )
    fj(idx).block_until_ready()
    reps = 3
    t0 = time.time()
    r = idx
    for _ in range(reps):
        r = fj(r)
    float(r[0])
    dt = (time.time() - t0) / (reps * K)
    print(f"{name:44s} {dt*1e6:9.1f} us/step")
    return dt


def main():
    rng = np.random.default_rng(1)
    t32 = jnp.asarray(rng.integers(0, 2**31 - 1, (NBLK, 8), dtype=np.int32))
    t64 = jax.lax.bitcast_convert_type(
        t32.reshape(NBLK, 4, 2), jnp.int64
    )
    f32 = jax.lax.bitcast_convert_type(t32, jnp.float32)
    t32p = jnp.pad(t32, ((0, 0), (0, 8)))  # 64-byte rows, 8 used
    flat = t32.reshape(-1)

    def spread(c, g):
        return (c + g * 1013) % (NBLK - 2)

    print(f"rows {NBLK}, lanes {B}, {K} serialized steps, 2 spread probes/step")

    bench("a) int32 (N,8) take [current]", lambda c: sum(
        jnp.take(t32, spread(c, g), axis=0)[:, 0] for g in range(2)))
    bench("b) int64 (N,4) take", lambda c: sum(
        jax.lax.bitcast_convert_type(
            jnp.take(t64, spread(c, g), axis=0), jnp.int32)[:, 0, 0]
        for g in range(2)))
    bench("c) float32 (N,8) take, bitcast", lambda c: sum(
        jax.lax.bitcast_convert_type(
            jnp.take(f32, spread(c, g), axis=0), jnp.int32)[:, 0]
        for g in range(2)))
    bench("d) int32 (N,16) padded rows", lambda c: sum(
        jnp.take(t32p, spread(c, g), axis=0)[:, 0] for g in range(2)))
    bench("e) int32 flat dynamic-slice x8", lambda c: sum(
        jax.vmap(lambda i: jax.lax.dynamic_slice(flat, (i * 8,), (8,)))(
            spread(c, g))[:, 0]
        for g in range(2)))
    bench("f) int64 fill_value=None mode=clip", lambda c: sum(
        jax.lax.bitcast_convert_type(
            jnp.take(t64, spread(c, g), axis=0, mode="clip"),
            jnp.int32)[:, 0, 0]
        for g in range(2)))
    # 1-probe variants to expose the serialization floor
    bench("g) int64 1 probe", lambda c: jax.lax.bitcast_convert_type(
        jnp.take(t64, spread(c, 0), axis=0), jnp.int32)[:, 0, 0])
    bench("h) no gather (elementwise only)", lambda c: (c * 3 + 1)[:])
    # throughput (independent probes, 8 per step, no serialization)
    bench("i) int64 8 independent probes", lambda c: sum(
        jax.lax.bitcast_convert_type(
            jnp.take(t64, (c * (g + 3) + g * 997) % (NBLK - 2), axis=0),
            jnp.int32)[:, 0, 0]
        for g in range(8)))
    bench("j) int32 8 independent probes", lambda c: sum(
        jnp.take(t32, (c * (g + 3) + g * 997) % (NBLK - 2), axis=0)[:, 0]
        for g in range(8)))


if __name__ == "__main__":
    jax.config.update("jax_enable_x64", True)
    main()
