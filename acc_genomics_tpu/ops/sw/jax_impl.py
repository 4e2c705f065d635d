"""Batched XLA fill for HTC Smith-Waterman (exact integer DP).

Time-major layout like the PairHMM kernels: ref codes (R, B), alt codes
(C, B), batch on lanes.  A lax.scan walks ref rows; within each row the
horizontal gap scan
    step_right[j] = max_{k<j} sw'[k] + OPEN + (j-k-1)*EXT
is a running max over ``u[k] = sw'[k] - (k+1)*EXT`` evaluated with an
(argmax-first) associative scan — the lane-parallel replacement for the
reference's Kogge-Stone max_scan (htc-sw/host/FalconSW_AVX.cpp:38-300)
and the AVX2 deferred-scan stripes.

Padding safety: the DP only flows toward larger indices, so cells inside
each pair's real (reflen+1) x (altlen+1) region are bit-identical no
matter how much padding follows; the host backtrack just slices.

Outputs per batch:
  btrack      (R, C, B) int16  — step-length backtrack codes, rows 1..R
  sw_lastrow  (C+1, B)  int32  — sw at each pair's own last real row
  sw_altcol   (R, B)    int32  — sw at each pair's own last real column,
                                 rows 1..R
The host-side sw_backtrack_slim consumes these to produce exact CIGARs.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from acc_genomics_tpu.ops.sw.reference import (
    DEFAULT_SW_PARAMS,
    LOW_INIT,
    MATRIX_MIN_CUTOFF,
    OVERHANG_INDEL,
    OVERHANG_LEADING_INDEL,
    OVERHANG_SOFTCLIP,
    OVERHANG_IGNORE,
    STATE_CLIP,
    STATE_DELETION,
    STATE_INSERTION,
    STATE_MATCH,
    SWParams,
)

I32 = jnp.int32


def _argmax_first_scan(u, axis):
    """(running max, argmax keeping first occurrence) along axis."""
    n = u.shape[axis]
    idx = jax.lax.broadcasted_iota(I32, u.shape, axis)

    def combine(left, right):
        lv, li = left
        rv, ri = right
        take_r = rv > lv
        return jnp.where(take_r, rv, lv), jnp.where(take_r, ri, li)

    return jax.lax.associative_scan(combine, (u, idx), axis=axis)


@functools.partial(jax.jit, static_argnames=("strategy", "params"))
def sw_fill(ref_tm, alt_tm, reflen, altlen, strategy: int,
            params: SWParams = DEFAULT_SW_PARAMS):
    """Fill for a padded batch.

    ref_tm: (R, B) int32 codes (pad >= 4 never matches)
    alt_tm: (C, B) int32 codes
    reflen/altlen: (B,) int32 real lengths
    params: static scoring weights (SWConfig analog)
    """
    W_MATCH, W_MISMATCH, W_OPEN, W_EXTEND = params
    rows, bsz = ref_tm.shape
    cols = alt_tm.shape[0]
    indel_init = strategy in (OVERHANG_INDEL, OVERHANG_LEADING_INDEL)

    jidx = jnp.arange(1, cols + 1, dtype=I32)[:, None]  # (C, 1)
    if indel_init:
        sw0 = jnp.concatenate(
            [
                jnp.zeros((1, 1), I32),
                (W_OPEN + (jidx - 1) * W_EXTEND).astype(I32),
            ],
            axis=0,
        )
        sw0 = jnp.broadcast_to(sw0, (cols + 1, bsz))
        col0_ramp = lambda i: jnp.where(
            i == 0, 0, W_OPEN + (i - 1) * W_EXTEND
        ).astype(I32)
    else:
        sw0 = jnp.zeros((cols + 1, bsz), I32)
        col0_ramp = lambda i: jnp.zeros((), I32)

    # make carries batch-varying for shard_map friendliness
    sw0 = sw0 + (reflen[None, :] * 0)
    bgv0 = jnp.full((cols, bsz), LOW_INIT, I32) + (reflen[None, :] * 0)
    gsv0 = jnp.zeros((cols, bsz), I32) + (reflen[None, :] * 0)
    swlast0 = sw0  # pairs with reflen==0 keep row 0
    row_iota = jnp.arange(rows, dtype=I32)

    def step(carry, row_in):
        sw_prev, bgv, gsv, sw_last = carry
        ref_i, i = row_in  # ref_i: (B,), i: scalar row index (1-based row i+1)
        irow = i + 1
        wd = jnp.where(alt_tm == ref_i[None, :], W_MATCH, W_MISMATCH).astype(I32)
        step_diag = sw_prev[:-1] + wd
        prev_gap = sw_prev[1:] + W_OPEN
        bgv_ext = bgv + W_EXTEND
        take = prev_gap > bgv_ext
        bgv_n = jnp.where(take, prev_gap, bgv_ext)
        gsv_n = jnp.where(take, 1, gsv + 1)
        step_down = bgv_n
        kd = gsv_n

        diag_ge_down = step_diag >= step_down
        sw_prime = jnp.where(diag_ge_down, step_diag, step_down)

        col0 = jnp.broadcast_to(col0_ramp(irow).reshape(1, 1), (1, bsz)).astype(I32)
        spf = jnp.concatenate([col0, sw_prime[:-1]], axis=0)  # sw'[k], k=0..C-1
        u = spf - jidx * W_EXTEND
        run_max, k_best = _argmax_first_scan(u, axis=0)
        step_right = run_max + W_OPEN + jidx * W_EXTEND
        ki = (jidx - 1) - k_best + 1

        use_diag = diag_ge_down & (step_diag >= step_right)
        use_right = (~use_diag) & (step_right >= step_down)
        val = jnp.where(
            use_diag, step_diag, jnp.where(use_right, step_right, step_down)
        )
        sw_row_body = jnp.maximum(MATRIX_MIN_CUTOFF, val)
        btr = jnp.where(
            use_diag, 0, jnp.where(use_right, -ki, kd)
        ).astype(jnp.int16)
        sw_row = jnp.concatenate([col0, sw_row_body], axis=0)

        is_lastrow = (irow == reflen)[None, :]
        sw_last_n = jnp.where(is_lastrow, sw_row, sw_last)
        sw_at_altcol = jnp.take_along_axis(
            sw_row, altlen[None, :].astype(I32), axis=0
        )[0]
        return (sw_row, bgv_n, gsv_n, sw_last_n), (btr, sw_at_altcol)

    (sw_f, _, _, sw_last), (btrack, sw_altcol) = jax.lax.scan(
        step, (sw0, bgv0, gsv0, swlast0), (ref_tm, row_iota)
    )
    return btrack, sw_last, sw_altcol


def sw_backtrack_slim(
    btrack_pair: np.ndarray,  # (R, C) rows 1..R, cols 1..C
    sw_lastrow: np.ndarray,  # (C+1,) sw at row reflen
    sw_altcol: np.ndarray,  # (R,) sw[i][altlen] for i = 1..R
    reflen: int,
    altlen: int,
    strategy: int,
) -> Tuple[List[Tuple[int, int]], int]:
    """Start-cell selection + walk (calculateCigarOneBatch semantics)."""
    segment_length = 0
    if strategy == OVERHANG_INDEL:
        p1, p2 = reflen, altlen
    else:
        p2 = altlen
        p1 = 0
        maxscore = -(1 << 62)
        for i in range(1, reflen + 1):
            if int(sw_altcol[i - 1]) >= maxscore:
                p1 = i
                maxscore = int(sw_altcol[i - 1])
        if strategy != OVERHANG_LEADING_INDEL:
            for j in range(1, altlen + 1):
                cur = int(sw_lastrow[j])
                if cur > maxscore or (
                    cur == maxscore and abs(reflen - j) < abs(p1 - p2)
                ):
                    p1 = reflen
                    p2 = j
                    maxscore = cur
                    segment_length = altlen - j

    elements: List[Tuple[int, int]] = []
    if segment_length > 0 and strategy == OVERHANG_SOFTCLIP:
        elements.append((segment_length, STATE_CLIP))
        segment_length = 0

    state = STATE_MATCH
    while True:
        btr = int(btrack_pair[p1 - 1, p2 - 1])
        if btr > 0:
            new_state, step = STATE_DELETION, btr
        elif btr < 0:
            new_state, step = STATE_INSERTION, -btr
        else:
            new_state, step = STATE_MATCH, 1
        if new_state == STATE_MATCH:
            p1 -= 1
            p2 -= 1
        elif new_state == STATE_INSERTION:
            p2 -= step
        else:
            p1 -= step
        if new_state == state:
            segment_length += step
        else:
            elements.append((segment_length, state))
            segment_length = step
            state = new_state
        if not (p1 > 0 and p2 > 0):
            break

    if strategy == OVERHANG_SOFTCLIP:
        elements.append((segment_length, state))
        if p2 > 0:
            elements.append((p2, STATE_CLIP))
        offset = p1
    elif strategy == OVERHANG_IGNORE:
        elements.append((segment_length + p2, state))
        offset = p1 - p2
    else:
        elements.append((segment_length, state))
        if p1 > 0:
            elements.append((p1, STATE_DELETION))
        elif p2 > 0:
            elements.append((p2, STATE_INSERTION))
        offset = 0

    elements.reverse()
    return elements, offset


def sw_align_batch(refs, alts, strategy: int, rows: int, cols: int,
                   params: SWParams = DEFAULT_SW_PARAMS):
    """Batched alignment: lists of ref/alt code arrays -> [(cigar, offset)].

    Pads to (rows, cols), fills on device, backtracks on host.
    """
    bsz = len(refs)
    ref_tm = np.full((rows, bsz), 255, np.int32)
    alt_tm = np.full((cols, bsz), 255, np.int32)
    reflen = np.zeros(bsz, np.int32)
    altlen = np.zeros(bsz, np.int32)
    for k, (r, a) in enumerate(zip(refs, alts)):
        if len(r) > rows or len(a) > cols:
            raise ValueError("sequence exceeds bucket")
        ref_tm[: len(r), k] = r
        alt_tm[: len(a), k] = a
        reflen[k] = len(r)
        altlen[k] = len(a)
    btrack, sw_lastrow, sw_altcol = sw_fill(
        jnp.asarray(ref_tm), jnp.asarray(alt_tm),
        jnp.asarray(reflen), jnp.asarray(altlen), strategy, params,
    )
    btrack = np.asarray(btrack)
    sw_lastrow = np.asarray(sw_lastrow)
    sw_altcol = np.asarray(sw_altcol)
    out = []
    for k in range(bsz):
        out.append(
            sw_backtrack_slim(
                btrack[:, :, k], sw_lastrow[:, k], sw_altcol[:, k],
                int(reflen[k]), int(altlen[k]), strategy,
            )
        )
    return out
