"""Device-side Smith-Waterman backtrack walker.

The fill kernel (ops/sw/kernel.py) leaves the step-length btrack matrix
diag-major in HBM; shipping it to the host costs hundreds of MB per
batch and a per-pair Python reconstruction.  The walk itself only
touches <= reflen + altlen cells per pair, so it runs on device as a
batched per-lane walk (the same flat-state-machine pattern as the SMEM
engine): each iteration gathers one btrack cell per lane, takes one
step-length-encoded move, and run-length-encodes CIGAR elements into
fixed-size buffers.  Only the tiny element buffers cross back to the
host — the reference keeps the walk on-chip for the same reason
(htc-sw/xlnx/smithWatermanMerlin.cpp: on-chip btrack + final backtrack).

Start-cell selection (max over the last row / last alt column with
GATK's exact tie-breaking, calculateCigarOneBatch semantics —
htc-sw/host/FalconSW_AVX.cpp:2314-2339) is vectorized over lanes:
the sequential "accept if strictly closer to (reflen, altlen)" chain
reduces to an argmin of 2*|reflen-j| + (j > reflen) over the maximal
cells, with the no-strict-improvement tie gate preserved.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from acc_genomics_tpu.ops.sw.reference import (
    OVERHANG_IGNORE,
    OVERHANG_INDEL,
    OVERHANG_LEADING_INDEL,
    OVERHANG_SOFTCLIP,
    STATE_CLIP,
    STATE_DELETION,
    STATE_INSERTION,
    STATE_MATCH,
)

I32 = jnp.int32
LANES = 128
LOW = jnp.int32(-(1 << 30))
# Element-buffer cap == shipped prefix: en keeps counting past the cap,
# and any pair with more elements reruns on the host (the reference's
# interval-overflow contract).  Small buffers matter: they ride the
# while-loop carry in HBM, paying a full read+write per walk step.
MAX_ELEMS = 48
SHIP_ELEMS = MAX_ELEMS


def _write_elem(buf_len, buf_st, slot, ln, stt, mask):
    io = jax.lax.broadcasted_iota(I32, buf_len.shape, 0)
    w = (io == jnp.minimum(slot, MAX_ELEMS - 1)[None, :]) & mask[None, :]
    return (
        jnp.where(w, ln[None, :], buf_len),
        jnp.where(w, stt[None, :], buf_st),
    )


@functools.partial(jax.jit, static_argnames=("strategy",))
def sw_walk_device(btr, lastrow_diag, altcol_diag, reflen, altlen, strategy: int):
    """Batched backtrack from the diag-major fill outputs.

    btr: (B//128, D, R, 128) int16; lastrow_diag/altcol_diag: (D, B) i32;
    reflen/altlen: (B,).  Returns one packed int16 array
    (2*MAX_ELEMS+2, B): element lengths, element states, count, offset —
    elements in WALK order (reverse of CIGAR order; host reverses while
    decoding).
    """
    nblk, n_diag, rows, lanes = btr.shape
    B = lastrow_diag.shape[1]
    rl = reflen.astype(I32)
    al = altlen.astype(I32)
    flat = btr.reshape(-1).astype(jnp.int16)
    lane_blk = jnp.arange(B, dtype=I32) // LANES
    lane_in = jnp.arange(B, dtype=I32) % LANES

    dd = jax.lax.broadcasted_iota(I32, (n_diag, B), 0)

    # ---- start-cell selection -------------------------------------------
    # altcol_diag[d] = sw[i][altlen] at d = (i-1) + (al-1)  ->  i = d-al+2
    ii = dd - al[None, :] + 2
    vac = (ii >= 1) & (ii <= rl[None, :])
    va = jnp.where(vac, altcol_diag, LOW)
    m1 = jnp.max(va, axis=0)
    # last argmax over i ("">="" keeps the largest i)
    p1_a = jnp.max(jnp.where(vac & (va == m1[None, :]), ii, 0), axis=0)

    if strategy == OVERHANG_INDEL:
        p1 = rl
        p2 = al
        seg = jnp.zeros(B, I32)
    elif strategy == OVERHANG_LEADING_INDEL:
        p1 = p1_a
        p2 = al
        seg = jnp.zeros(B, I32)
    else:
        # lastrow_diag[d] = sw[reflen][j] at d = (rl-1) + (j-1) -> j = d-rl+2
        jjr = dd - rl[None, :] + 2
        vlr = (jjr >= 1) & (jjr <= al[None, :])
        vr = jnp.where(vlr, lastrow_diag, LOW)
        m_lr = jnp.max(vr, axis=0)
        elig = vlr & (vr == m_lr[None, :])
        dist = jnp.abs(rl[None, :] - jjr)
        key = 2 * dist + (jjr > rl[None, :]).astype(I32)
        kmin = jnp.min(jnp.where(elig, key, jnp.int32(1 << 30)), axis=0)
        jstar = jnp.min(
            jnp.where(elig & (key == kmin[None, :]), jjr, jnp.int32(1 << 30)), axis=0
        )
        strict = m_lr > m1
        tie = (m_lr == m1) & ((kmin >> 1) < jnp.abs(p1_a - al))
        upd = strict | tie
        p1 = jnp.where(upd, rl, p1_a)
        p2 = jnp.where(upd, jstar, al)
        seg = jnp.where(upd, al - jstar, 0)

    elem_len = jnp.zeros((MAX_ELEMS, B), I32)
    elem_st = jnp.zeros((MAX_ELEMS, B), I32)
    en = jnp.zeros(B, I32)

    if strategy == OVERHANG_SOFTCLIP:
        flush = seg > 0
        elem_len, elem_st = _write_elem(
            elem_len, elem_st, en, seg, jnp.full(B, STATE_CLIP, I32), flush
        )
        en = jnp.where(flush, 1, 0)
        seg = jnp.zeros(B, I32)

    state = jnp.full(B, STATE_MATCH, I32)

    def cond(s):
        return jnp.any(s["active"])

    def body(s):
        # ONE cell per gather: TPU HBM gathers are element-throughput
        # bound (~14 ns/element measured), so widening the gather to
        # consume match runs costs more than the steps it saves
        p1, p2 = s["p1"], s["p2"]
        act = s["active"]
        d = p1 - 1 + p2 - 1
        idx = ((lane_blk * n_diag + jnp.clip(d, 0, n_diag - 1)) * rows
               + jnp.clip(p1 - 1, 0, rows - 1)) * LANES + lane_in
        b = jnp.take(flat, idx).astype(I32)
        new_state = jnp.where(b > 0, STATE_DELETION,
                              jnp.where(b < 0, STATE_INSERTION, STATE_MATCH))
        step = jnp.where(b > 0, b, jnp.where(b < 0, -b, 1))
        p1n = jnp.where(new_state == STATE_DELETION, p1 - step,
                        jnp.where(new_state == STATE_MATCH, p1 - 1, p1))
        p2n = jnp.where(new_state == STATE_INSERTION, p2 - step,
                        jnp.where(new_state == STATE_MATCH, p2 - 1, p2))
        changed = act & (new_state != s["state"])
        el, es = _write_elem(
            s["elem_len"], s["elem_st"], s["en"], s["seg"], s["state"], changed
        )
        en2 = jnp.where(changed, s["en"] + 1, s["en"])
        seg2 = jnp.where(act, jnp.where(changed, step, s["seg"] + step), s["seg"])
        st2 = jnp.where(changed, new_state, s["state"])
        p1o = jnp.where(act, p1n, p1)
        p2o = jnp.where(act, p2n, p2)
        return dict(
            p1=p1o, p2=p2o, state=st2, seg=seg2, en=en2,
            elem_len=el, elem_st=es,
            active=act & (p1o > 0) & (p2o > 0),
        )

    init = dict(
        p1=p1, p2=p2, state=state, seg=seg, en=en,
        elem_len=elem_len, elem_st=elem_st,
        active=(p1 > 0) & (p2 > 0) & (rl > 0) & (al > 0),
    )
    def body4(s):
        # 4 steps per iteration: the carry (element buffers + registers)
        # lives in HBM, so fewer carry round trips per gather step
        for _ in range(4):
            s = body(s)
        return s

    fin = jax.lax.while_loop(cond, body4, init)
    p1, p2 = fin["p1"], fin["p2"]
    seg, state, en = fin["seg"], fin["state"], fin["en"]
    elem_len, elem_st = fin["elem_len"], fin["elem_st"]
    ones = jnp.ones(B, bool)

    if strategy == OVERHANG_SOFTCLIP:
        elem_len, elem_st = _write_elem(elem_len, elem_st, en, seg, state, ones)
        en = en + 1
        clip = p2 > 0
        elem_len, elem_st = _write_elem(
            elem_len, elem_st, en, p2, jnp.full(B, STATE_CLIP, I32), clip
        )
        en = jnp.where(clip, en + 1, en)
        offset = p1
    elif strategy == OVERHANG_IGNORE:
        elem_len, elem_st = _write_elem(elem_len, elem_st, en, seg + p2, state, ones)
        en = en + 1
        offset = p1 - p2
    else:
        elem_len, elem_st = _write_elem(elem_len, elem_st, en, seg, state, ones)
        en = en + 1
        dmask = p1 > 0
        imask = (p1 <= 0) & (p2 > 0)
        elem_len, elem_st = _write_elem(
            elem_len, elem_st, en, p1, jnp.full(B, STATE_DELETION, I32), dmask
        )
        elem_len, elem_st = _write_elem(
            elem_len, elem_st, en, p2, jnp.full(B, STATE_INSERTION, I32), imask
        )
        en = jnp.where(dmask | imask, en + 1, en)
        offset = jnp.zeros(B, I32)

    # one packed int16 payload, tiny on the wire: element length (<= 3072,
    # 12 bits) and state (3 bits) share an int16 (len | st << 12); only the
    # first SHIP_ELEMS elements ship (real CIGARs have ~5-10; longer ones
    # rerun on the host like buffer overflows).  A single array means a
    # single D2H transfer — the dev tunnel charges ~25 ms per fetch plus
    # ~90 us/KB, so this is the difference between 100 ms and 30 ms e2e.
    lens = jnp.concatenate([elem_len[:SHIP_ELEMS], en[None, :], offset[None, :]])
    states = jnp.concatenate(
        [elem_st[:SHIP_ELEMS], jnp.zeros((2, B), I32)]
    )
    return (lens | (states << 12)).astype(jnp.int16)


def decode_elements(packed, n_real):
    """Packed walk-order element buffer (SHIP_ELEMS+2, B) -> [(cigar,
    offset)] in CIGAR order.  Returns (results, overflow mask); overflow
    pairs need a host rerun."""
    packed = np.asarray(packed)
    elem_len = packed[:SHIP_ELEMS] & 0x0FFF
    elem_st = (packed[:SHIP_ELEMS] >> 12) & 0x7
    en = packed[SHIP_ELEMS]
    offset = packed[SHIP_ELEMS + 1]
    out = []
    overflow = en > SHIP_ELEMS
    for k in range(n_real):
        if overflow[k]:
            out.append(None)
            continue
        n = int(en[k])
        cig = [
            (int(elem_len[j, k]), int(elem_st[j, k])) for j in range(n - 1, -1, -1)
        ]
        out.append((cig, int(offset[k])))
    return out, overflow
