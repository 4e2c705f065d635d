#!/usr/bin/env python
"""HaplotypeCaller-core driver: composed SW + PairHMM region pipeline.

The analog of the reference's GATK integration surface (htc-sw's
lib_htc_sw.so realignment + the pairhmm client, consumed per active
region).  Synthesizes active regions — a reference window, haplotypes as
SNP/indel variants of it, reads sampled from the haplotypes — runs
HaplotypeCallerCore.process_regions, and oracle-checks both outputs:
exact CIGARs vs the SW oracle and 5e-3 likelihoods vs the PairHMM
oracle (sampled).  Also sanity-checks read->haplotype assignment.
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
from acc_genomics_tpu.models.haplotype_caller import HaplotypeCallerCore
from acc_genomics_tpu.ops.pairhmm.reference import pairhmm_loglik_oracle
from acc_genomics_tpu.ops.sw.reference import sw_align_oracle


def gen_region(rng, ref_len=300, n_haps=4, n_reads=24, read_len=101):
    ref = rng.integers(0, 4, ref_len).astype(np.uint8)
    haps = []
    for _ in range(n_haps):
        h = ref.copy()
        snp = rng.random(len(h)) < 0.01
        h[snp] = (h[snp] + rng.integers(1, 4, int(snp.sum()))) % 4
        if rng.random() < 0.5:
            pos = int(rng.integers(1, len(h) - 4))
            if rng.random() < 0.5:
                h = np.delete(h, slice(pos, pos + int(rng.integers(1, 4))))
            else:
                ins = rng.integers(0, 4, int(rng.integers(1, 4))).astype(np.uint8)
                h = np.insert(h, pos, ins)
        haps.append(h.astype(np.uint8))
    reads = []
    src = []
    for _ in range(n_reads):
        k = int(rng.integers(0, n_haps))
        h = haps[k]
        off = int(rng.integers(0, max(1, len(h) - read_len)))
        rs = h[off : off + read_len].copy()
        err = rng.random(len(rs)) < 0.005
        rs[err] = (rs[err] + rng.integers(1, 4, int(err.sum()))) % 4
        reads.append(
            dict(
                rs=rs,
                q=np.clip(rng.normal(30, 5, len(rs)), 6, 127).astype(np.uint8),
                i=np.clip(rng.normal(40, 1, len(rs)), 1, 127).astype(np.uint8),
                d=np.clip(rng.normal(40, 1, len(rs)), 1, 127).astype(np.uint8),
                c=np.full(len(rs), 10, np.uint8),
            )
        )
        src.append(k)
    return ref, haps, reads, src


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--regions", type=int, default=16)
    ap.add_argument("--reads-per-region", type=int, default=24)
    ap.add_argument("--check-regions", type=int, default=2)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    engine = GenomicsEngine()
    hc = HaplotypeCallerCore(engine)
    regions, sources = [], []
    for _ in range(args.regions):
        ref, haps, reads, src = gen_region(
            rng, n_reads=args.reads_per_region
        )
        regions.append((ref, haps, reads))
        sources.append(src)

    hc.process_regions(regions)  # warm the jit cache
    t0 = time.time()
    results = hc.process_regions(regions)
    dt = time.time() - t0

    failures = 0
    # exact CIGAR parity on the first regions
    for (ref, haps, reads), res in list(zip(regions, results))[: args.check_regions]:
        for h, (cig, off) in zip(haps, res.hap_cigars):
            wc, wo = sw_align_oracle(ref, h, hc.overhang_strategy)
            if [tuple(e) for e in wc] != [tuple(e) for e in cig] or wo != off:
                failures += 1
        # sampled likelihood parity
        for r_i in range(0, len(reads), max(1, len(reads) // 4)):
            r = reads[r_i]
            for h_i, h in enumerate(haps):
                want = pairhmm_loglik_oracle(
                    r["rs"], r["q"], r["i"], r["d"], r["c"], h
                )
                got = res.likelihoods[r_i, h_i]
                if abs(got - want) / max(abs(want), 1e-12) > 5e-3:
                    failures += 1
    # read -> source-haplotype recovery (reads have ~0.5% errors, so the
    # argmax haplotype should usually be the read's source)
    hits = total = 0
    for res, src in zip(results, sources):
        hits += int((res.best_hap == np.asarray(src)).sum())
        total += len(src)
    recov = hits / max(total, 1)
    n_pairs = sum(len(r) * len(h) for _, h, r in regions)
    print(
        f"== {args.regions} regions ({n_pairs} read-hap pairs) in {dt*1e3:.0f} ms "
        f"({args.regions/dt:.1f} regions/s), best-hap recovery {recov:.2f} "
        f"{'FAILED' if failures or recov < 0.55 else 'PASSED'}"
    )
    return 1 if failures or recov < 0.55 else 0


if __name__ == "__main__":
    sys.exit(main())
