#!/usr/bin/env python
"""Probe-census for the SMEM machine: where do iterations go, and how
much would the unique-interval (s==1) text-comparison fast path save?

Replays the oracle control flow (ops/smem/reference.py =
smem/host/baseline.cpp) with counters per probe category, then models
the flat machine's iteration count per lane with and without collapsing
runs of consecutive s==1 forward probes into ceil(run/16) text-slice
iterations.  This is the measurement behind the round-3 fast-path
design (PERF_NOTES "SMEM round-2 findings").

Usage: python benchmarks/smem_probe_stats.py [--npz data/chr100m.fm.npz]
       [--genome 2000000] [--reads 200]
"""

import argparse
import collections
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from acc_genomics_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()  # kernel/machine bodies are multi-minute cold compiles

from acc_genomics_tpu.io.synth import gen_smem_reads
from acc_genomics_tpu.ops.smem.index import FMIndex
from acc_genomics_tpu.ops.smem.reference import DEFAULT_SMEM_PARAMS, _iv


def trace_read(fm, seq, params, stats, runs):
    """mem_collect_intv_new control flow with probe counters.  Returns
    the per-lane machine-iteration estimate (slow, fast16)."""
    ln = len(seq)
    mem = []

    def probe(phase, s, min_intv):
        stats[phase] += 1
        if s == 1:
            stats[phase + "_s1"] += 1
            if min_intv == 1:
                stats[phase + "_s1mi1"] += 1
        # Pair-coalescing census: the machine's two occ probes hit rows
        # blk(k-1) and blk(k-1+s).  A (nblk, 16) paired table whose row i
        # carries blocks [i, i+1] serves BOTH probes with one B-row gather
        # whenever the pair spans <= 2 blocks: always for s <= 64, with
        # probability (128 - s)/64 for 64 < s < 128 (offset ~uniform).
        if s <= 64:
            stats["pair_fit"] += 1.0
        elif s < 128:
            stats["pair_fit"] += (128.0 - s) / 64.0
        if s <= 192:
            stats["pair_fit4"] += 1.0  # 4-block (nblk, 32) row, 256 bases
        elif s < 256:
            stats["pair_fit4"] += (256.0 - s) / 64.0

    def smem1a(x, min_intv):
        nonlocal fwd_run
        if seq[x] > 3:
            return x + 1
        min_intv = max(min_intv, 1)
        x0, x1, s = fm.set_intv(int(seq[x]))
        ik = _iv(x0, x1, s, 0, x + 1)
        curr = []
        i = x + 1
        run = 0
        while i < ln:
            if seq[i] < 4:
                c = 3 - int(seq[i])
                probe("fwd", ik["s"], min_intv)
                if ik["s"] == 1 and min_intv == 1:
                    run += 1
                elif run:
                    runs["fwd"].append(run)
                    run = 0
                ok = fm.extend((ik["x0"], ik["x1"], ik["s"]), 0)
                if ok[c][2] != ik["s"]:
                    curr.append(dict(ik))
                    if ok[c][2] < min_intv:
                        break
                ik = _iv(ok[c][0], ok[c][1], ok[c][2], 0, i + 1)
            else:
                curr.append(dict(ik))
                break
            i += 1
        if run:
            runs["fwd"].append(run)
        if i == ln:
            curr.append(dict(ik))
        ret = curr[-1]["end"]
        back_intv = []
        start = x
        stop = x
        temp = None
        i = 0
        while i < len(curr):
            ik = dict(curr[i])
            ik["start"] = x
            if not back_intv or stop - start >= 3:
                back_intv = [dict(ik)]
                k = x - 1
                brun = 0
                while k >= -1:
                    c = -1 if k < 0 else (int(seq[k]) if seq[k] < 4 else -1)
                    if c >= 0:
                        probe("back", ik["s"], min_intv)
                        if ik["s"] == 1 and min_intv == 1:
                            brun += 1
                        elif brun:
                            runs["back"].append(brun)
                            brun = 0
                        ok = fm.extend((ik["x0"], ik["x1"], ik["s"]), 1)
                        if ok[c][2] < min_intv:
                            break
                        ik = _iv(ok[c][0], ok[c][1], ok[c][2], k, curr[i]["end"])
                        back_intv.append(dict(ik))
                    else:
                        break
                    k -= 1
                if brun:
                    runs["back"].append(brun)
                start = curr[i]["end"]
                stop = curr[i + 1]["end"] if i < len(curr) - 1 else ln
                if i == 0:
                    temp = dict(ik)
                elif (
                    ik["start"] > temp["start"]
                    and temp["end"] - temp["start"] >= params.min_seed_len
                ):
                    mem.append(dict(temp))
                    temp = dict(ik)
                else:
                    temp = dict(ik)
            else:
                stop = curr[i]["end"]
                isbreak = False
                for k in range(len(back_intv) - 1, -1, -1):
                    ik = dict(back_intv[k])
                    for m in range(start + 1, stop + 1):
                        c = 3 - int(seq[m - 1])
                        probe("fwde", ik["s"], min_intv)
                        ok = fm.extend((ik["x0"], ik["x1"], ik["s"]), 0)
                        if ok[c][2] < min_intv:
                            break
                        ik = _iv(ok[c][0], ok[c][1], ok[c][2], ik["start"], ik["end"])
                        if m == stop:
                            ik["start"] = x - k
                            ik["end"] = curr[i]["end"]
                            isbreak = True
                    if isbreak:
                        if (
                            (x - k) > temp["start"]
                            and temp["end"] - temp["start"] >= params.min_seed_len
                        ):
                            mem.append(dict(temp))
                            temp = dict(ik)
                        else:
                            temp = dict(ik)
                        break
                if isbreak is False:
                    pass
            i += 1
            if i < len(curr):
                max_len = temp["start"] + curr[i]["end"]
                while max_len < params.min_seed_len and i < len(curr):
                    i += 1
                    if i < len(curr):
                        stop = curr[i]["end"]
                    max_len = temp["start"] + stop
            if i >= len(curr) and temp["end"] - temp["start"] >= params.min_seed_len:
                mem.append(dict(temp))
        return ret

    fwd_run = 0
    x = 0
    while x < ln:
        if seq[x] < 4:
            x = smem1a(x, 1)
        else:
            x += 1
    old_n = len(mem)
    for k in range(old_n):
        p = mem[k]
        if p["end"] - p["start"] < params.split_len or p["s"] > params.split_width:
            continue
        smem1a((p["start"] + p["end"]) >> 1, p["s"] + 1)
    # pass 3
    x = 0
    while x < ln:
        if seq[x] < 4:
            x0, x1, s = fm.set_intv(int(seq[x]))
            ik = (x0, x1, s)
            stopped = False
            for i in range(x + 1, ln):
                if seq[i] < 4:
                    c = 3 - int(seq[i])
                    probe("p3", ik[2], 1)
                    ok = fm.extend(ik, 0)
                    if ok[c][2] < params.max_mem_intv and i - x >= params.min_seed_len:
                        x = i + 1
                        stopped = True
                        break
                    ik = (ok[c][0], ok[c][1], ok[c][2])
                else:
                    x = i + 1
                    stopped = True
                    break
            if not stopped:
                x = ln
        else:
            x += 1
    return mem


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz")
    ap.add_argument("--genome", type=int, default=2_000_000)
    ap.add_argument("--reads", type=int, default=100)
    ap.add_argument("--read-len", type=int, default=101)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    if args.npz:
        fm = FMIndex.load(args.npz)
        genome = fm.text[: fm.seq_len // 2]
    else:
        genome = rng.integers(0, 4, args.genome).astype(np.uint8)
        fm = FMIndex.build(genome)
    reads = gen_smem_reads(rng, genome, args.reads, read_len=args.read_len)

    agg = collections.Counter()
    per_read_slow, per_read_fast = [], []
    for r in reads:
        stats = collections.Counter()
        runs = {"fwd": [], "back": []}
        trace_read(fm, r, DEFAULT_SMEM_PARAMS, stats, runs)
        for k, v in stats.items():
            agg[k] += v
        slow = sum(stats[p] for p in ("fwd", "back", "fwde", "p3"))
        saved_f = sum(n - -(-n // 16) for n in runs["fwd"])
        saved_b = sum(n - -(-n // 16) for n in runs["back"])
        per_read_slow.append(slow)
        per_read_fast.append((slow - saved_f, slow - saved_f - saved_b))
    tot = sum(agg[p] for p in ("fwd", "back", "fwde", "p3"))
    print(f"reads={len(reads)} total probes={tot} (mean {tot/len(reads):.0f}/read)")
    print(
        f"pair-coalescing fit: 2-block row {agg['pair_fit']/tot:5.1%}, "
        f"4-block row {agg['pair_fit4']/tot:5.1%} of probe pairs"
    )
    for p in ("fwd", "back", "fwde", "p3"):
        print(
            f"  {p:5s}: {agg[p]:8d} ({agg[p]/tot:5.1%})   "
            f"s==1: {agg[p+'_s1']:8d} ({agg[p+'_s1']/max(agg[p],1):5.1%})   "
            f"s==1&mi==1: {agg[p+'_s1mi1']:8d}"
        )
    sl = np.array(per_read_slow)
    ff = np.array([a for a, _ in per_read_fast])
    fb = np.array([b for _, b in per_read_fast])
    print(
        f"probe count per read  slow: mean {sl.mean():.0f} max {sl.max()}\n"
        f"  fwd-fast16          : mean {ff.mean():.0f} max {ff.max()} "
        f"(max ratio {sl.max()/ff.max():.2f}x)\n"
        f"  fwd+back-fast16     : mean {fb.mean():.0f} max {fb.max()} "
        f"(max ratio {sl.max()/fb.max():.2f}x)"
    )


if __name__ == "__main__":
    main()
