"""SW engine end-to-end GCUPS (fill + device walk + transfers + decode)."""
import time
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from acc_genomics_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()  # kernel/machine bodies are multi-minute cold compiles

import numpy as np

from acc_genomics_tpu.engine.genomics_engine import GenomicsEngine
from acc_genomics_tpu.io.synth import gen_sw_batch


def main(batch=1024, ref_len=286, K=8):
    rng = np.random.default_rng(0)
    eng = GenomicsEngine()
    ref, alts = gen_sw_batch(rng, batch, ref_len=ref_len)
    eng.sw_align(ref, alts, 0)  # warm the jit cache
    t0 = time.perf_counter()
    for _ in range(K):
        eng.sw_align(ref, alts, 0)
    dt = (time.perf_counter() - t0) / K
    cells = sum(len(ref) * len(a) for a in alts)
    print(f"sw_e2e: {dt:.3f}s  {cells/dt/1e9:.2f} GCUPS ({batch} pairs)")


if __name__ == "__main__":
    main()
