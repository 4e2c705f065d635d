#!/usr/bin/env python
"""HTC-SW driver: batch-size sweep with exact CIGAR comparison.

The analog of htc-sw/host/sw_host.cpp: random ~286bp reference, alts
with +-5% length jitter and 10% mutations, batch sizes swept in powers
of two, exact CIGAR + offset comparison against the oracle, GCUPS board.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from acc_genomics_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()  # machine/kernel bodies are multi-minute cold compiles

from acc_genomics_tpu.engine.genomics_engine import GenomicsEngine
from acc_genomics_tpu.io.synth import gen_sw_batch
from acc_genomics_tpu.ops.sw.reference import sw_align_oracle
from acc_genomics_tpu.utils.timer import Scoreboard


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-len", type=int, default=286)
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--strategy", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    engine = GenomicsEngine()
    board = Scoreboard()
    failures = 0
    batch = 1
    while batch <= args.max_batch:
        ref, alts = gen_sw_batch(rng, batch, ref_len=args.ref_len)
        t0 = time.time()
        got = engine.sw_align(ref, alts, args.strategy)
        dt = time.time() - t0
        cells = sum(len(ref) * len(a) for a in alts)
        rate = board.record(cells, dt)
        for a, res in zip(alts, got):
            if res != sw_align_oracle(ref, a, args.strategy):
                failures += 1
        print(f"batch {batch}: {rate/1e9:.3f} GCUPS {'FAIL' if failures else 'ok'}")
        batch *= 2
    print(
        f"== avg {board.average/1e9:.3f} GCUPS peak {board.peak/1e9:.3f} "
        f"{'FAILED' if failures else 'PASSED'}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
