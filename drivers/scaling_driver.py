#!/usr/bin/env python
"""Scaling scoreboard: data-parallel PairHMM over 1..N devices.

The analog of the reference's multi-die / multi-worker scaling story
(SLR-proportional distribution, Blaze worker tiling): shard the packed
batch over a growing "data" mesh and report throughput + parallel
efficiency per device count.  On a real multi-chip slice the same code
scales over ICI; here it runs on whatever jax.devices() offers (set
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu for
a virtual 8-device mesh).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from acc_genomics_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()  # machine/kernel bodies are multi-minute cold compiles


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=1024)
    ap.add_argument("--rows", type=int, default=64)
    ap.add_argument("--cols", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon TPU plugin overrides the env var; force it (see
        # .claude/skills/verify gotchas)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from acc_genomics_tpu.io.synth import gen_pairhmm_pairs
    from acc_genomics_tpu.ops.pairhmm.pack import pack_pairhmm_batch
    from acc_genomics_tpu.parallel import make_mesh
    from acc_genomics_tpu.parallel.sharded import (
        pairhmm_forward_dp,
        pairhmm_forward_dp_pallas,
    )

    n_dev = len(jax.devices())
    on_tpu = jax.devices()[0].platform == "tpu"
    rng = np.random.default_rng(0)
    tcs = gen_pairhmm_pairs(
        rng, args.pairs, max_read_len=args.rows - 2, max_hap_len=args.cols
    )
    pack = pack_pairhmm_batch(tcs, rows=args.rows, cols=args.cols)
    arrays = [jnp.asarray(v) for v in pack.arrays()]
    cells = pack.cells
    if on_tpu:
        from acc_genomics_tpu.ops.pairhmm.kernel import block_diag_counts

        bd = jnp.asarray(block_diag_counts(pack))

        def fwd(mesh, *arrs):
            return pairhmm_forward_dp_pallas(mesh, *arrs, block_diags=bd)

    else:
        fwd = pairhmm_forward_dp

    if jax.devices()[0].platform == "cpu" and n_dev > 1:
        print(
            "NOTE: virtual host devices share one physical CPU — this run "
            "validates the sharded path; speedups only appear on real chips"
        )
    base_rate = None
    counts = [d for d in (1, 2, 4, 8, 16) if d <= n_dev]
    for d in counts:
        mesh = make_mesh((d, 1))
        out = fwd(mesh, *arrays)  # compile
        np.asarray(out)
        t0 = time.time()
        for _ in range(args.reps):
            out = fwd(mesh, *arrays)
        np.asarray(out)
        dt = (time.time() - t0) / args.reps
        rate = cells / dt / 1e9
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * d)
        print(
            f"{d} device(s): {rate:8.3f} GCUPS  "
            f"speedup {rate/base_rate:5.2f}x  efficiency {eff:5.1%}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
