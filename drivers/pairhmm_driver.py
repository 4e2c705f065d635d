#!/usr/bin/env python
"""PairHMM end-to-end driver: golden comparison + GCUPS scoreboard.

The analog of the reference's pairhmm_test.cpp: synthetic mode (--syn N)
generates the same input distributions, real mode (--real dir) reads the
reference text corpus (input%d / output%d); the oracle (fp32 + fp64
recompute) is the golden; results must match within rel. err 5e-3.
"""

import argparse
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from acc_genomics_tpu.engine.genomics_engine import GenomicsEngine
from acc_genomics_tpu.io.pairhmm_text import read_pairhmm_input, read_pairhmm_output
from acc_genomics_tpu.io.synth import gen_pairhmm_input
from acc_genomics_tpu.ops.pairhmm.reference import pairhmm_loglik_oracle
from acc_genomics_tpu.utils.timer import Scoreboard


def _flat_matrix_args(reads, haps):
    cat = lambda key: (
        np.concatenate([np.asarray(r[key], np.uint8) for r in reads])
        if reads else np.zeros(0, np.uint8)
    )
    rlens = np.array([len(r["rs"]) for r in reads], np.int32)
    hlens = np.array([len(h) for h in haps], np.int32)
    hap = (
        np.concatenate([np.asarray(h, np.uint8) for h in haps])
        if haps else np.zeros(0, np.uint8)
    )
    return (cat("rs"), cat("q"), cat("i"), cat("d"), cat("c"), rlens,
            hap, hlens)


def run_case(engine, reads, haps, golden=None, board=None, check_frac=1.0):
    # flat wire-format ingestion: per-batch (not per-pair) host prep, the
    # production path (compute_matrix_flat)
    fargs = _flat_matrix_args(reads, haps)
    engine.pairhmm_matrix_flat(*fargs)  # warm the jit cache for this shape
    t0 = time.time()
    lik = engine.pairhmm_matrix_flat(*fargs)
    dt = time.time() - t0
    cells = sum(len(r["rs"]) * len(h) for r in reads for h in haps)
    rate = board.record(cells, dt) if board else cells / dt
    flat = lik.reshape(-1)
    if golden is None:
        n_check = max(1, int(len(reads) * check_frac))
        golden = np.array(
            [
                pairhmm_loglik_oracle(r["rs"], r["q"], r["i"], r["d"], r["c"], h)
                for r in reads[:n_check]
                for h in haps
            ]
        )
        flat = lik[:n_check].reshape(-1)
    rel = np.abs(flat - golden) / np.maximum(np.abs(golden), 1e-12)
    n_bad = int((rel > 5e-3).sum())
    return n_bad, float(rel.max()), rate, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--syn", type=int, default=0, help="synthetic tests")
    ap.add_argument(
        "--independent", action="store_true",
        help="independent random reads/haps (underflow-heavy, the "
        "reference GenInputs shape) instead of hap-derived reads",
    )
    ap.add_argument("--real", type=str, default="", help="corpus directory")
    ap.add_argument("--check-frac", type=float, default=0.25)
    args = ap.parse_args()

    engine = GenomicsEngine()
    board = Scoreboard()
    failures = 0
    if args.real:
        inputs = sorted(glob.glob(os.path.join(args.real, "input*")))
        for inp in inputs:
            out = inp.replace("input", "output")
            reads, haps = read_pairhmm_input(inp)
            golden = read_pairhmm_output(out) if os.path.exists(out) else None
            n_bad, worst, rate, dt = run_case(engine, reads, haps, golden, board)
            failures += n_bad
            print(
                f"{os.path.basename(inp)}: {len(reads)}x{len(haps)} pairs "
                f"{rate/1e9:.2f} GCUPS worst rel err {worst:.2e} "
                f"{'FAIL' if n_bad else 'ok'}"
            )
    else:
        rng = np.random.default_rng(0)
        for t in range(max(args.syn, 1)):
            reads, haps = gen_pairhmm_input(
                rng, 16 * (t + 1), t + 1, derived=not args.independent
            )
            n_bad, worst, rate, dt = run_case(
                engine, reads, haps, board=board, check_frac=args.check_frac
            )
            failures += n_bad
            print(
                f"syn {t}: {len(reads)}x{len(haps)} pairs {rate/1e9:.2f} GCUPS "
                f"worst rel err {worst:.2e} {'FAIL' if n_bad else 'ok'}"
            )
    print(
        f"== avg {board.average/1e9:.2f} GCUPS peak {board.peak/1e9:.2f} GCUPS "
        f"recomputed {engine.pairhmm.stats['recomputed']} "
        f"{'FAILED' if failures else 'PASSED'}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
