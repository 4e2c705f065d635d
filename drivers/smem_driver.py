#!/usr/bin/env python
"""SMEM end-to-end driver: exact golden comparison + reads/s scoreboard.

The analog of smem/main.cpp randomTest: obtains an index — synthetic
genome, FASTA (bwa_idx_build analog), an on-disk ``bwa index`` directory
(bwa_idx_load analog, io/bwa_index.py byte formats), or a cached
FMIndex .npz — runs batches of reads through the device engine and the
host oracle, compares intervals exactly after canonical sort, and
reports reads/s plus the analytical BWT-traffic bandwidth and index
scale numbers (build time, host RSS, fused-table HBM footprint — the
reference loads BWTs up to 1e9 entries, smem/main.cpp:426-453).

Examples:
  python drivers/smem_driver.py --genome 100000000          # 100 Mbp synthetic
  python drivers/smem_driver.py --fasta ref.fa --save-npz ref.fm.npz
  python drivers/smem_driver.py --index /path/bwa/prefix    # bwa index dir
  python drivers/smem_driver.py --npz ref.fm.npz
"""

import argparse
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from acc_genomics_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()  # machine/kernel bodies are multi-minute cold compiles

from acc_genomics_tpu.engine.genomics_engine import GenomicsEngine
from acc_genomics_tpu.io.synth import gen_reference_with_repeats, gen_smem_reads
from acc_genomics_tpu.ops.smem.index import FMIndex
from acc_genomics_tpu.ops.smem.reference import mem_collect_intv_oracle


def canon(ivs):
    return sorted((iv["x0"], iv["x1"], iv["s"], iv["start"], iv["end"]) for iv in ivs)


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def obtain_index(args, rng):
    """-> (fm, genome or None).  Prints index provenance + scale stats."""
    t0 = time.time()
    if args.npz:
        fm = FMIndex.load(args.npz)
        src = f"npz {args.npz}"
        genome = fm.text[: fm.seq_len // 2]
    elif args.index:
        from acc_genomics_tpu.io.bwa_index import load_bwa_index

        fm, anns = load_bwa_index(args.index, validate=not args.no_validate)
        src = f"bwa index {args.index} ({len(anns.contigs)} contigs)"
        genome = fm.text[: fm.seq_len // 2]
    elif args.fasta:
        from acc_genomics_tpu.io.bwa_index import build_index_from_fasta

        fm, anns = build_index_from_fasta(args.fasta)
        src = f"fasta {args.fasta} ({len(anns.contigs)} contigs)"
        genome = fm.text[: fm.seq_len // 2]
    else:
        genome = gen_reference_with_repeats(rng, args.genome)
        fm = FMIndex.build(genome)
        src = f"synthetic {args.genome} bp"
    dt = time.time() - t0
    if args.save_npz:
        fm.save(args.save_npz)
        print(f"index cached to {args.save_npz}")
    tbl_bytes = fm.bwt_packed.shape[0] * 32
    print(
        f"index [{src}]: {fm.seq_len} BWT entries, built/loaded in {dt:.1f}s, "
        f"host RSS {rss_gb():.2f} GB, fused probe table {tbl_bytes/1e6:.0f} MB"
    )
    return fm, genome


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome", type=int, default=50_000,
                    help="synthetic genome length (bp)")
    ap.add_argument("--fasta", help="build the index from a FASTA file")
    ap.add_argument("--index", help="load a `bwa index` prefix (.pac/.bwt/.sa)")
    ap.add_argument("--npz", help="load a cached FMIndex .npz")
    ap.add_argument("--save-npz", help="cache the built index to .npz")
    ap.add_argument("--no-validate", action="store_true",
                    help="skip byte-level cross-check when loading a bwa index")
    ap.add_argument("--reads", type=int, default=2048)
    ap.add_argument("--reads-file",
                    help="text read file, one ACGTN read per line (the "
                         "reference driver's getBatch format, "
                         "smem/main.cpp:71-93); overrides --reads")
    ap.add_argument("--read-len", type=int, default=101)
    ap.add_argument("--batches", type=int, default=3)
    ap.add_argument("--check", type=int, default=32, help="reads golden-checked per batch")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    fm, genome = obtain_index(args, rng)
    if genome is None:
        genome = fm.text[: fm.seq_len // 2]
    engine = GenomicsEngine()
    t0 = time.time()
    engine.set_index(fm)
    print(f"index uploaded to device in {time.time()-t0:.2f}s")

    file_reads = None
    if args.reads_file:
        # nst_nt4-style encode: ACGT -> 0..3, everything else N (4)
        lut = np.full(256, 4, np.uint8)
        for i, c in enumerate("ACGT"):
            lut[ord(c)] = i
            lut[ord(c.lower())] = i
        with open(args.reads_file) as f:
            file_reads = [
                lut[np.frombuffer(line.strip().encode(), np.uint8)]
                for line in f if line.strip()
            ]
        args.reads = len(file_reads)
        args.batches = 1

    def batch_reads():
        if file_reads is not None:
            return file_reads
        return gen_smem_reads(rng, genome, args.reads, read_len=args.read_len)

    # warm the jit cache at the real batch shape before timing
    engine.smem_collect(batch_reads())

    failures = 0
    total_reads = 0
    total_time = 0.0
    for b in range(args.batches):
        reads = batch_reads()
        t0 = time.time()
        got = engine.smem_collect(reads)
        dt = time.time() - t0
        total_reads += len(reads)
        total_time += dt
        for k in range(min(args.check, len(reads))):
            want = mem_collect_intv_oracle(fm, reads[k])
            if canon(got[k]) != canon(want):
                failures += 1
        n_iv = sum(len(g) for g in got)
        print(
            f"batch {b}: {len(reads)} reads {len(reads)/dt:.0f} reads/s "
            f"{n_iv} intervals "
            f"overflow reruns {engine.smem.stats['overflow_reruns']}"
        )
    # analytical BWT probe traffic (2 probes x 32 B per machine iteration
    # per lane), the analog of the reference's per-bank DRAM accounting
    # (smem/host/baseline.cpp, smem/main.cpp:352-366)
    iters = engine.smem.stats["probe_iters"]
    traffic = iters * 2 * 32 * args.reads
    print(
        f"== {total_reads/total_time:.0f} reads/s, "
        f"{traffic/total_time/1e9:.2f} GB/s probe traffic "
        f"{'FAILED' if failures else 'PASSED'}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
