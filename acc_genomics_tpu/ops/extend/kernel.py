"""Pallas TPU kernel for banded seed extension (ksw_extend2 semantics).

One lane per extension task, query positions on sublanes, a while_loop
over target rows — the TPU counterpart of the reference's 20 seed PEs
each running the banded query_loop (bwa-sw/sdaccel/smithwaterman.cpp:
75-273).  Identical DP semantics to ops/extend/jax_impl.sw_extend_batch
(adaptive band, zero-run narrowing, break on m == 0, two-round band
doubling, gscore-vs-clip bookkeeping); integer DP, bit-exact results.

Wins over the XLA scan path:

* eh_h/eh_e carries live in VMEM scratch — the scan's per-row HBM
  round-trip of the (Q+2, B) register file disappears;
* per-block row trip counts (scalar prefetch over tlen-sorted packing);
* true early exit: the row loop is a while_loop that stops as soon as
  every lane in the block has broken (m == 0) — the reference's
  per-seed `break`, which a lax.scan must pad to the full bucket;
* round 2 is skipped outright when every lane's round-1 result already
  satisfies the band-doubling break test.

The in-row F chain
    f(j) = max_{k<j in band} max(M(k) - oe_ins, 0) - (j-1-k)*e_ins
is a Kogge-Stone shift-max ladder over sublanes (log2(Q) steps), the
same scan trick as the row-wise AVX SW (htc-sw/host/FalconSW_AVX.cpp:
38-300).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from acc_genomics_tpu.ops.extend.reference import (
    DEFAULT_EXTEND_PARAMS,
    ExtendParams,
)

LANES = 128
I32 = jnp.int32
NEG = -(1 << 29)


def _extend_kernel(
    nd_ref,  # scalar prefetch: per-block row trip count
    q_ref, t_ref, qlen_ref, tlen_ref, h0_ref, maxins_ref, maxdel_ref,
    score_out, qle_out, tle_out, gtle_out, gscore_out, moff_out, w_out,
    ehh_buf, ehe_buf, reg_buf,
    *, params: ExtendParams,
):
    O_DEL, E_DEL, O_INS, E_INS = (
        params.o_del, params.e_del, params.o_ins, params.e_ins
    )
    W_IN = params.w
    SC_MATCH, SC_MISMATCH, SC_AMB = (
        params.sc_match, params.sc_mismatch, params.sc_ambig
    )
    # reg_buf rows (all i32; alive/done as 0/1):
    # 0 beg, 1 end, 2 h1_init, 3 alive, 4 max_score, 5 max_i, 6 max_j,
    # 7 max_ie, 8 gscore, 9 max_off — loop state lives in VMEM because
    # Mosaic cannot yield sub-vreg (1, 128) vectors from scf loops
    QP = q_ref.shape[0]
    blk = pl.program_id(0)
    qlen = qlen_ref[:]  # (1, L)
    tlen = tlen_ref[:]
    h0 = h0_ref[:]
    max_ins = maxins_ref[:]
    max_del = maxdel_ref[:]
    nd = nd_ref[blk]

    lane = (1, LANES)
    zero = jnp.zeros(lane, I32)
    oe_del = O_DEL + E_DEL
    oe_ins = O_INS + E_INS

    ehh_buf[:] = jnp.zeros((QP, LANES), I32)
    ehe_buf[:] = jnp.zeros((QP, LANES), I32)

    def rd(r):
        return reg_buf[pl.ds(r, 1), :]

    def wr(r, v):
        reg_buf[pl.ds(r, 1), :] = v

    def run_round(k, regs):
        (reg_score, aw_used, done) = regs
        prev = reg_score
        band_w = jnp.full(lane, W_IN << k, I32)
        aw1 = jnp.minimum(jnp.minimum(band_w, max_ins), max_del)
        round_active = jnp.logical_not(done)
        aw_used = jnp.where(round_active, band_w, aw_used)

        wr(0, zero)  # beg
        wr(1, qlen)  # end
        wr(2, h0 - O_DEL)  # h1_init
        wr(3, round_active.astype(I32))  # alive

        # sliding query window: a round-k band spans <= 2*aw1max + 2 query
        # rows, so long query buckets only touch a W-row vreg window per
        # target row (band windowing).  W covers the worst band plus the
        # 8-row alignment slack of the window origin; W == QP (short
        # buckets) degenerates to the full-width path (w0 == 0 always).
        W = min(QP, -(-(2 * (W_IN << k) + 9) // 8) * 8)
        aw1max = jnp.max(aw1)
        jj_loc = jax.lax.broadcasted_iota(I32, (W, LANES), 0)
        zero_w = jnp.zeros((W, LANES), I32)
        neg_w = jnp.full((W, LANES), NEG, I32)
        wshape = (W, LANES)

        def cummax_w(u):
            sh = 1
            while sh < W:
                rolled = pltpu.roll(u, sh, 0)
                u = jnp.maximum(u, jnp.where(jj_loc < sh, neg_w, rolled))
                sh <<= 1
            return u

        def row_step(i, _):
            beg, end, h1_init = rd(0), rd(1), rd(2)
            alive = rd(3) != 0
            max_score, max_i, max_j = rd(4), rd(5), rd(6)
            max_ie, gscore, max_off = rd(7), rd(8), rd(9)
            t_i = t_ref[pl.ds(i, 1), :]  # (1, L)
            beg = jnp.maximum(beg, i - aw1)
            end = jnp.minimum(jnp.minimum(end, i + aw1 + 1), qlen)
            at0 = beg == 0
            h1_init = jnp.where(jnp.logical_and(alive, at0), h1_init - E_DEL, h1_init)
            h1_beg = jnp.where(at0, jnp.maximum(h1_init, 0), 0)

            # window origin: multiple of 8, always <= every lane's beg
            # (w0 = clip(i - aw1max) rounded down; beg >= i - aw1)
            w0 = jnp.clip(i - aw1max, 0, QP - W)
            w0 = (w0 // 8) * 8
            jj = jj_loc + w0
            qc_w = q_ref[pl.ds(w0, W), :]
            ehh = ehh_buf[pl.ds(w0, W), :]
            ehe = ehe_buf[pl.ds(w0, W), :]

            in_band = jnp.logical_and(jj >= beg, jj < end)
            # mat[t_i, q_j] arithmetically (bwa_fill_scmat): match +1,
            # mismatch -4, either-ambiguous -1
            amb = jnp.logical_or(jnp.broadcast_to(t_i >= 4, wshape), qc_w >= 4)
            sc = jnp.where(
                amb, SC_AMB,
                jnp.where(jnp.broadcast_to(t_i, wshape) == qc_w, SC_MATCH, SC_MISMATCH),
            )
            first = i == 0
            # row 0 of the DP: j==0 -> h0, else max(h0 - oe_ins - (j-1)*e_ins, 0)
            row0_m_w = jnp.where(
                jj == 0,
                jnp.broadcast_to(h0, wshape),
                jnp.maximum(
                    jnp.broadcast_to(jnp.maximum(h0 - oe_ins, 0), wshape)
                    - (jj - 1) * E_INS,
                    0,
                ),
            )
            m_in = jnp.where(first, row0_m_w, ehh)
            e_in = jnp.where(first, zero_w, ehe)
            M = jnp.where(m_in != 0, m_in + sc, 0)
            t_del = jnp.maximum(M - oe_del, 0)
            e_out = jnp.maximum(e_in - E_DEL, t_del)
            t_ins = jnp.maximum(M - oe_ins, 0)
            # f(j) = run(j-1) - (j-1)*e_ins with run = cummax(t_ins + j*e_ins);
            # the roll wrap-in at window row 0 is guarded by the LOCAL index
            # (that row is always <= beg, where f = 0 is correct/masked)
            run = cummax_w(jnp.where(in_band, t_ins + jj * E_INS, neg_w))
            f = jnp.where(jj_loc < 1, neg_w, pltpu.roll(run, 1, 0)) - (jj - 1) * E_INS
            f = jnp.maximum(f, 0)
            h = jnp.maximum(jnp.maximum(M, e_in), f)
            h = jnp.where(in_band, h, 0)

            # H(i, j-1): shift h down one row, inject h1_beg at j == beg
            hprev = jnp.where(jj_loc < 1, zero_w, pltpu.roll(h, 1, 0))
            hprev = jnp.where(jj == beg, jnp.broadcast_to(h1_beg, wshape), hprev)

            band_nonempty = end > beg
            h_end = jnp.max(
                jnp.where(jj == jnp.maximum(end - 1, 0), h, NEG),
                axis=0, keepdims=True,
            )
            h1_last = jnp.where(band_nonempty, h_end, h1_beg)

            # m / mj: last argmax among visited columns ("m <= h" update)
            h_band = jnp.where(in_band, h, -1)
            m = jnp.maximum(jnp.max(h_band, axis=0, keepdims=True), 0)
            eq = jnp.logical_and(in_band, h_band == m)
            mj = jnp.max(jnp.where(eq, jj, -1), axis=0, keepdims=True)

            # zero-run narrowing over (hprev == 0 & e_out == 0)
            zcond = jnp.logical_and(hprev == 0, e_out == 0)
            not_z = jnp.logical_and(in_band, jnp.logical_not(zcond))
            first_false = jnp.min(
                jnp.where(not_z, jj, QP), axis=0, keepdims=True
            )
            forw = jnp.clip(first_false, beg, end) - beg
            last_false = jnp.max(jnp.where(not_z, jj, -1), axis=0, keepdims=True)
            trail = jnp.where(
                band_nonempty, end - 1 - jnp.maximum(last_false, beg - 1), 0
            )
            backw = jnp.where(h1_last == 0, trail + 1, 0)

            # eh update in [beg, end) + eh[end] = (h1, 0); stale elsewhere
            ehh_new = jnp.where(in_band, hprev, ehh)
            ehe_new = jnp.where(in_band, e_out, ehe)
            at_end = jj == end
            ehh_new = jnp.where(at_end, jnp.broadcast_to(h1_last, wshape), ehh_new)
            ehe_new = jnp.where(at_end, 0, ehe_new)
            row_active = jnp.logical_and(alive, i < tlen)
            ehh_buf[pl.ds(w0, W), :] = jnp.where(row_active, ehh_new, ehh)
            ehe_buf[pl.ds(w0, W), :] = jnp.where(row_active, ehe_new, ehe)

            # gscore: the scalar loop tests j == qlen after the row sweep
            j_after = jnp.maximum(beg, end)
            gupd = jnp.logical_and(
                jnp.logical_and(row_active, j_after == qlen), gscore <= h1_last
            )
            max_ie = jnp.where(gupd, i, max_ie)
            gscore = jnp.where(gupd, h1_last, gscore)

            brk = jnp.logical_and(row_active, m == 0)
            alive = jnp.logical_and(alive, jnp.logical_not(brk))
            mupd = jnp.logical_and(
                jnp.logical_and(row_active, jnp.logical_not(brk)), m > max_score
            )
            max_score = jnp.where(mupd, m, max_score)
            max_i = jnp.where(mupd, i, max_i)
            max_j = jnp.where(mupd, mj, max_j)
            off = jnp.abs(mj - i)
            max_off = jnp.where(jnp.logical_and(mupd, off > max_off), off, max_off)

            beg = jnp.where(row_active, beg + forw, beg)
            end = jnp.where(
                row_active, jnp.minimum(end - backw + 2, qlen), end
            )
            wr(0, beg)
            wr(1, end)
            wr(2, h1_init)
            wr(3, alive.astype(I32))
            wr(4, max_score)
            wr(5, max_i)
            wr(6, max_j)
            wr(7, max_ie)
            wr(8, gscore)
            wr(9, max_off)
            return 0

        # true early exit: stop as soon as every lane in the block has
        # broken (m == 0) — the reference's per-seed `break`
        # (bwa-sw/sdaccel/smithwaterman.cpp:251); the condition reads the
        # alive flags from VMEM each trip
        def loop_cond(i):
            return jnp.logical_and(i < nd, jnp.max(rd(3)) > 0)

        def loop_body(i):
            row_step(i, 0)
            return i + 1

        jax.lax.while_loop(loop_cond, loop_body, jnp.int32(0))
        max_score, max_off = rd(4), rd(9)

        reg_score = jnp.where(round_active, max_score, reg_score)
        brk = jnp.logical_or(
            max_score == prev,
            max_off < ((band_w >> 1) + (band_w >> 2)),
        )
        done = jnp.logical_or(done, jnp.logical_or(
            jnp.logical_and(round_active, brk), jnp.logical_not(round_active)
        ))
        return (reg_score, aw_used, done)

    neg1 = zero - 1
    wr(4, h0)  # max_score
    wr(5, neg1)  # max_i
    wr(6, neg1)  # max_j
    wr(7, neg1)  # max_ie
    wr(8, neg1)  # gscore
    wr(9, zero)  # max_off
    regs = (
        h0,  # reg_score
        jnp.full(lane, W_IN, I32),  # aw_used
        zero > 0,  # done
    )
    regs = run_round(0, regs)
    # round 2's rows all mask out when every lane passed the
    # band-doubling break test (alive = ~done is all-false)
    regs = run_round(1, regs)

    score_out[:] = regs[0]
    qle_out[:] = rd(6) + 1
    tle_out[:] = rd(5) + 1
    gtle_out[:] = rd(7) + 1
    gscore_out[:] = rd(8)
    moff_out[:] = rd(9)
    w_out[:] = regs[1]


@functools.partial(jax.jit, static_argnames=("interpret", "params"))
def sw_extend_pallas(
    q_tm, t_tm, qlen, tlen, h0, max_ins, max_del,
    block_rows=None, interpret=False,
    params: ExtendParams = DEFAULT_EXTEND_PARAMS,
):
    """Pallas banded extension.  Same contract as jax_impl.sw_extend_batch:
    q_tm (Q, B) / t_tm (T, B) int32 codes (pad 4), per-lane (B,) int32
    scalars; returns dict of (B,) int32.  B must be a multiple of 128.

    block_rows: per-128-lane-block row trip counts (<= T); lanes whose
    tlen exceeds their block's count get truncated results — callers pack
    tlen-sorted so the block count is the block's max tlen.
    """
    Q, bsz = q_tm.shape
    T = t_tm.shape[0]
    if bsz % LANES:
        raise ValueError(f"batch {bsz} must be a multiple of {LANES}")
    QP = -(-(Q + 2) // 8) * 8
    q_tm = jnp.concatenate(
        [q_tm.astype(I32), jnp.full((QP - Q, bsz), 4, I32)], axis=0
    )
    nblk = bsz // LANES
    if block_rows is None:
        block_rows = jnp.full((nblk,), T, jnp.int32)

    qspec = pl.BlockSpec((QP, LANES), lambda b, nd: (0, b), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((T, LANES), lambda b, nd: (0, b), memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((1, LANES), lambda b, nd: (0, b), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((1, bsz), I32)

    outs = pl.pallas_call(
        functools.partial(_extend_kernel, params=params),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblk,),
            in_specs=[qspec, tspec] + [lspec] * 5,
            out_specs=(lspec,) * 7,
            scratch_shapes=[
                pltpu.VMEM((QP, LANES), I32),  # eh_h
                pltpu.VMEM((QP, LANES), I32),  # eh_e
                pltpu.VMEM((16, LANES), I32),  # per-lane registers
            ],
        ),
        out_shape=(out_shape,) * 7,
        interpret=interpret,
    )(
        jnp.asarray(block_rows, jnp.int32),
        q_tm, t_tm.astype(I32),
        qlen.reshape(1, -1).astype(I32), tlen.reshape(1, -1).astype(I32),
        h0.reshape(1, -1).astype(I32),
        max_ins.reshape(1, -1).astype(I32), max_del.reshape(1, -1).astype(I32),
    )
    keys = ("score", "qle", "tle", "gtle", "gscore", "max_off", "w")
    return {k: v.reshape(-1) for k, v in zip(keys, outs)}


def extend_tasks_pallas(tasks, max_q: int, max_t: int,
                        interpret: bool = False,
                        params: ExtendParams = DEFAULT_EXTEND_PARAMS,
                        ) -> Dict[str, np.ndarray]:
    """tasks: list of dicts with query/target nt4 arrays and h0.  Packs
    tlen-sorted into 128-lane blocks with per-block trip counts and runs
    the Pallas extension; returns dict of (len(tasks),) arrays."""
    n = len(tasks)
    perm = sorted(range(n), key=lambda k: -len(tasks[k]["target"]))
    bsz = -(-n // LANES) * LANES
    q_tm = np.full((max_q, bsz), 4, np.int32)
    t_tm = np.full((max_t, bsz), 4, np.int32)
    qlen = np.zeros(bsz, np.int32)
    tlen = np.zeros(bsz, np.int32)
    h0 = np.zeros(bsz, np.int32)
    for j, k in enumerate(perm):
        t = tasks[k]
        q, tg = t["query"], t["target"]
        if len(q) > max_q or len(tg) > max_t:
            raise ValueError("task exceeds bucket")
        q_tm[: len(q), j] = q
        t_tm[: len(tg), j] = tg
        qlen[j] = len(q)
        tlen[j] = len(tg)
        h0[j] = t["h0"]
    block_rows = np.maximum(
        tlen.reshape(-1, LANES).max(axis=1), 1
    ).astype(np.int32)
    res = sw_extend_pallas(
        jnp.asarray(q_tm), jnp.asarray(t_tm), jnp.asarray(qlen),
        jnp.asarray(tlen), jnp.asarray(h0), jnp.asarray(qlen),
        jnp.asarray(qlen), jnp.asarray(block_rows), interpret=interpret,
        params=params,
    )
    out = {k: np.zeros(n, np.int64) for k in res}
    for j, k in enumerate(perm):
        for key in out:
            out[key][k] = int(np.asarray(res[key])[j])
    return out
