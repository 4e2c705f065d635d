"""Pallas banded-extension kernel: exact parity vs the oracle and the
XLA scan implementation (interpret mode on CPU)."""

import numpy as np
import pytest

from acc_genomics_tpu.ops.extend.kernel import (
    LANES,
    extend_tasks_pallas,
    sw_extend_pallas,
)
from acc_genomics_tpu.ops.extend.reference import sw_extend_oracle
from test_extend import KEYS, _rand_tasks


def _check(tasks, got):
    for k, t in enumerate(tasks):
        want = sw_extend_oracle(t["query"], t["target"], h0=t["h0"])
        for key in KEYS:
            assert int(got[key][k]) == int(want[key]), (
                f"task {k} {key}: got {got[key][k]} want {want[key]} "
                f"ql={len(t['query'])} tl={len(t['target'])} h0={t['h0']}"
            )


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_extend_exact(rng, seed):
    r = np.random.default_rng(seed)
    tasks = _rand_tasks(r, 40, maxq=48, maxt=60)
    got = extend_tasks_pallas(tasks, 64, 64, interpret=True)
    _check(tasks, got)


def test_pallas_extend_degenerate(rng):
    # empty query/target, h0 saturation, all-ambiguous
    tasks = [
        dict(query=np.zeros(0, np.uint8), target=np.zeros(0, np.uint8), h0=7),
        dict(query=np.zeros(0, np.uint8),
             target=rng.integers(0, 4, 9).astype(np.uint8), h0=3),
        dict(query=rng.integers(0, 4, 9).astype(np.uint8),
             target=np.zeros(0, np.uint8), h0=3),
        dict(query=np.full(12, 4, np.uint8),
             target=rng.integers(0, 4, 12).astype(np.uint8), h0=5),
        dict(query=rng.integers(0, 4, 16).astype(np.uint8),
             target=rng.integers(0, 4, 16).astype(np.uint8), h0=1),
    ]
    got = extend_tasks_pallas(tasks, 32, 32, interpret=True)
    _check(tasks, got)


def test_pallas_extend_block_rows(rng):
    # two lane blocks with different trip counts: results must not depend
    # on the other block's length
    tasks = []
    for _ in range(LANES):
        q = rng.integers(0, 4, 24).astype(np.uint8)
        tasks.append(dict(query=q, target=q[:20].copy(), h0=10))
    for _ in range(LANES):
        q = rng.integers(0, 4, 24).astype(np.uint8)
        t = np.concatenate([q, rng.integers(0, 4, 30).astype(np.uint8)])
        tasks.append(dict(query=q, target=t, h0=10))
    got = extend_tasks_pallas(tasks, 32, 64, interpret=True)
    _check(tasks, got)
