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


def test_pallas_extend_query_window(rng):
    """Sliding query-window path: a small band parameter activates the
    window at interpret-friendly shapes (W < QP); results must stay
    bit-identical to the XLA scan."""
    import jax.numpy as jnp

    from acc_genomics_tpu.ops.extend.jax_impl import sw_extend_batch
    from acc_genomics_tpu.ops.extend.kernel import LANES, sw_extend_pallas
    from acc_genomics_tpu.ops.extend.reference import ExtendParams

    p = ExtendParams(w=8)  # window W = 32 rows < QP
    B, Q, T = LANES, 62, 96
    q_tm = np.full((Q, B), 4, np.int32)
    t_tm = np.full((T, B), 4, np.int32)
    qlen = rng.integers(5, Q, B).astype(np.int32)
    tlen = rng.integers(5, T, B).astype(np.int32)
    for b in range(B):
        q = rng.integers(0, 4, qlen[b])
        q_tm[: qlen[b], b] = q
        t = rng.integers(0, 4, tlen[b])
        n = min(qlen[b], tlen[b])
        t[:n] = np.where(rng.random(n) < 0.9, q[:n], t[:n])
        t_tm[: tlen[b], b] = t
    h0 = rng.integers(3, 30, B).astype(np.int32)
    args = [jnp.asarray(x) for x in (q_tm, t_tm, qlen, tlen, h0, qlen, qlen)]
    br = jnp.asarray(np.full(1, T, np.int32))
    got = sw_extend_pallas(*args, br, interpret=True, params=p)
    want = sw_extend_batch(*args, params=p)
    for k in got:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))
