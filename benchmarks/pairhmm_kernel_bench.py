"""PairHMM Pallas kernel at a fixed WES-like shape (no transfers)."""
import time
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from acc_genomics_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()  # kernel/machine bodies are multi-minute cold compiles

import numpy as np
import jax
import jax.numpy as jnp

from acc_genomics_tpu.io.synth import gen_pairhmm_pairs
from acc_genomics_tpu.ops.pairhmm.kernel import (
    block_diag_counts,
    pairhmm_forward_pallas,
)
from acc_genomics_tpu.ops.pairhmm.pack import pack_pairhmm_batch


def main(n_pairs=2048, rows=152, cols=384, K=20):
    rng = np.random.default_rng(0)
    tcs = gen_pairhmm_pairs(rng, n_pairs, max_read_len=rows - 2, max_hap_len=cols)
    pack = pack_pairhmm_batch(
        tcs, rows=rows, cols=cols, dtype=np.float32, sort_by_haplen=True
    )
    args = [jnp.asarray(v) for v in pack.arrays()]
    bd = jnp.asarray(block_diag_counts(pack))

    def run_k(k):
        a, out, bump = list(args), None, jnp.float32(0)
        for _ in range(k):
            a[0] = a[0] + bump
            out = pairhmm_forward_pallas(*a, block_diags=bd)
            bump = out[:1].sum() * 0
        return out

    r = run_k(1)
    jax.block_until_ready(r)
    jax.device_get(r[:1])
    t0 = time.perf_counter()
    r = run_k(K)
    jax.device_get(r[:1])
    dt = (time.perf_counter() - t0) / K
    print(f"pairhmm: {dt*1e3:.2f} ms  {pack.cells/dt/1e9:.2f} eff GCUPS")


if __name__ == "__main__":
    main()
