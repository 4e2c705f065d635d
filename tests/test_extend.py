"""BWA-MEM seed extension: oracle properties + batched exact parity."""

import numpy as np
import pytest

from acc_genomics_tpu.ops.extend.jax_impl import extend_tasks_batch
from acc_genomics_tpu.ops.extend.reference import (
    extend_seed_oracle,
    sw_extend_oracle,
)

KEYS = ("score", "qle", "tle", "gtle", "gscore", "max_off", "w")


def test_perfect_extension(rng):
    # extending a seed through an exact match: score grows by +1 per base,
    # gscore reaches the end of the query
    q = rng.integers(0, 4, 30).astype(np.uint8)
    res = sw_extend_oracle(q, q, h0=19)
    assert res["score"] == 19 + 30
    assert res["gscore"] == 19 + 30
    assert res["qle"] == 30 and res["tle"] == 30


def test_mismatch_stops_extension(rng):
    q = rng.integers(0, 4, 20).astype(np.uint8)
    t = (q + 2) % 4  # all mismatch
    res = sw_extend_oracle(q, t, h0=10)
    assert res["score"] == 10  # no improvement
    assert res["qle"] == 0 and res["tle"] == 0


def test_extension_with_gap(rng):
    q = rng.integers(0, 4, 40).astype(np.uint8)
    t = np.concatenate([q[:20], rng.integers(0, 4, 2).astype(np.uint8), q[20:]])
    res = sw_extend_oracle(q, t, h0=19)
    # 40 matches - gap(open 6 + 2*ext... open6+ext1 per base): 19+40-8 = 51
    assert res["score"] == 19 + 40 - (6 + 1 * 2)


def _rand_tasks(rng, n, maxq=48, maxt=60):
    tasks = []
    for _ in range(n):
        ql = int(rng.integers(0, maxq))
        tl = int(rng.integers(0, maxt))
        q = rng.integers(0, 4, ql).astype(np.uint8)
        if tl and ql and rng.random() < 0.7:
            # make target resemble query with errors/indels
            t = q[: min(ql, tl)].copy()
            err = rng.random(len(t)) < 0.08
            t[err] = (t[err] + rng.integers(1, 4, err.sum())) % 4
            if len(t) < tl:
                t = np.concatenate([t, rng.integers(0, 4, tl - len(t)).astype(np.uint8)])
        else:
            t = rng.integers(0, 4, tl).astype(np.uint8)
        if ql and rng.random() < 0.1:
            q[rng.integers(0, ql)] = 4  # ambiguous base
        tasks.append(dict(query=q, target=t, h0=int(rng.integers(1, 40))))
    return tasks


def test_batch_exact_vs_oracle(rng):
    tasks = _rand_tasks(rng, 64)
    got = extend_tasks_batch(tasks, max_q=48, max_t=64)
    for k, t in enumerate(tasks):
        want = sw_extend_oracle(t["query"], t["target"], t["h0"])
        for key in KEYS:
            assert got[key][k] == want[key], (k, key, got[key][k], want[key],
                                              len(t["query"]), len(t["target"]))


def test_batch_long_reads_exact(rng):
    tasks = _rand_tasks(rng, 16, maxq=120, maxt=150)
    got = extend_tasks_batch(tasks, max_q=128, max_t=160)
    for k, t in enumerate(tasks):
        want = sw_extend_oracle(t["query"], t["target"], t["h0"])
        for key in KEYS:
            assert got[key][k] == want[key], (k, key)


def test_seed_resolution(rng):
    # full seed_proc semantics: exact-match seed inside a read
    genome = rng.integers(0, 4, 300).astype(np.uint8)
    read = genome[100:200].copy()
    res = extend_seed_oracle(read, genome[80:220], seed_qbeg=40, seed_rbeg_off=60, seed_len=20)
    # perfect read: full-length alignment
    assert res["qBeg"] == 0
    assert res["qEnd"] == 40  # right query length
    assert res["score"] == 100  # whole read matches


def test_extend_degenerate_seeds(rng):
    """Edge seeds: qbeg=0 (no left), seed at read end (no right),
    whole-read seed (neither side) — exact records vs oracle."""
    from acc_genomics_tpu.engine.extend_engine import ExtendEngine
    from acc_genomics_tpu.ops.extend.reference import extend_seed_oracle

    genome = rng.integers(0, 4, 1000).astype(np.uint8)
    pos = 300
    read = genome[pos : pos + 60].copy()
    lo = pos - 40
    rseq = genome[lo : pos + 100]
    seeds = [
        dict(read=read, rseq=rseq, qbeg=0, rbeg_off=pos - lo, len=20),
        dict(read=read, rseq=rseq, qbeg=40, rbeg_off=pos + 40 - lo, len=20),
        dict(read=read, rseq=rseq, qbeg=0, rbeg_off=pos - lo, len=60),
    ]
    eng = ExtendEngine()
    got = eng.extend_seeds(seeds)
    for s, g in zip(seeds, got):
        want = extend_seed_oracle(s["read"], s["rseq"], s["qbeg"], s["rbeg_off"], s["len"])
        assert g == {k: want[k] for k in g}, (s["qbeg"], s["len"], g, want)
