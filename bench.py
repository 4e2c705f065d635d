"""Headline benchmark: PairHMM effective GCUPS on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's published PairHMM FPGA average throughput,
15 GCUPS (pairhmm/xlnx/README.md, BASELINE.md row 1).  "Effective"
counts only real (unpadded) read x hap cells, like the reference's
GCUPS accounting from actual pair dimensions.

The workload is dispatched the way the engine dispatches it: pairs are
bucketed by read length (fewer sublane registers per op for short
reads), packed sorted by haplotype length, and each 128-lane block runs
only the diagonals its longest haplotype needs (scalar-prefetched
per-block trip counts).

Timing note: on the axon dev tunnel, block_until_ready() returns early
and D2H readback carries a ~25ms HTTP round trip.  We therefore time one
jit program that chains K passes over all buckets (each pass consuming a
value from the previous one so nothing can be elided) and divide; the
RTT amortizes to noise.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from acc_genomics_tpu.io.synth import gen_pairhmm_pairs
    from acc_genomics_tpu.ops.pairhmm.pack import pack_pairhmm_batch
    from acc_genomics_tpu.ops.pairhmm.jax_impl import pairhmm_forward
    from acc_genomics_tpu.ops.pairhmm.kernel import (
        block_diag_counts,
        pairhmm_forward_pallas,
    )

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"

    # production-like WES shapes: ~100-150bp reads vs ~300-400bp haps
    rng = np.random.default_rng(0)
    n_pairs = 8192 if on_tpu else 512
    rows_max, cols = 152, 384
    row_buckets = (64, 96, 128, rows_max)
    tcs = gen_pairhmm_pairs(rng, n_pairs, max_read_len=rows_max - 2, max_hap_len=cols)

    groups = {b: [] for b in row_buckets}
    for t in tcs:
        for b in row_buckets:
            if len(t["rs"]) < b:
                groups[b].append(t)
                break

    packs = []
    for rows, group in groups.items():
        if not group:
            continue
        packs.append(
            pack_pairhmm_batch(
                group, rows=rows, cols=cols, dtype=np.float32, sort_by_haplen=True
            )
        )
    bucket_args = [
        (
            [jax.device_put(jnp.asarray(v), dev) for v in p.arrays()],
            jax.device_put(jnp.asarray(block_diag_counts(p)), dev),
        )
        for p in packs
    ]
    cells = sum(p.cells for p in packs)

    fwd = (
        (lambda a, bd: pairhmm_forward_pallas(*a, block_diags=bd))
        if on_tpu
        else (lambda a, bd: pairhmm_forward(*a))
    )

    K = 16 if on_tpu else 2

    @jax.jit
    def chain():
        bump = jnp.float32(0.0)
        for _ in range(K):
            for a, bd in bucket_args:
                a = list(a)
                a[0] = a[0] + bump
                out = fwd(a, bd)
                bump = out[:1].sum() * 0.0
        return out

    np.asarray(chain())  # compile
    t = min(_timed(chain) for _ in range(3))
    per_pass = t / K

    gcups = cells / per_pass / 1e9
    baseline = 15.0  # reference PairHMM FPGA avg GCUPS
    print(
        json.dumps(
            {
                "metric": "pairhmm_effective_gcups_1chip",
                "value": round(float(gcups), 2),
                "unit": "GCUPS",
                "vs_baseline": round(float(gcups / baseline), 2),
            }
        )
    )


def _timed(fn):
    t0 = time.time()
    _ = np.asarray(fn())
    return time.time() - t0


if __name__ == "__main__":
    main()
