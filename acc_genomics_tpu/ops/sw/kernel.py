"""Pallas TPU kernel for the HTC Smith-Waterman fill.

Same wavefront geometry as the PairHMM kernel (one lane per pair, ref
rows on sublanes, one diagonal per step) applied to the integer
affine-gap DP with step-length backtrack codes — the TPU counterpart of
the reference's 8-PE anti-diagonal mini-kernel with rotating diagonal
buffers (htc-sw/xlnx/smithWatermanMerlin.cpp:196-300).

Per diagonal d, cell (i, j=d-i) (0-based interior; matrix row i+1, col
j+1):

  step_diag  = sw[d-2](i-1) + wd(ref[i], alt[j])          (shift down)
  vertical   : per-column tracker rides the shift; update with
               prev_gap = sw[d-1](i-1) + OPEN
  horizontal : per-row tracker is stationary (each row appears once per
               diagonal); update with prev_gap = sw[d-1](i) + OPEN
  sw[d](i)   = clamp(max(diag, right, down)), priority diag >= right >= down
  btrack     = 0 / -ki / kd, written diag-major via double-buffered DMA
               to HBM (the host reorders diagonals into rows)

Boundary injection: matrix row 0 enters via the shift-in (ramp for
INDEL strategies), matrix column 0 via an i == d mask using the
per-row ramp.  Cells beyond each pair's real lengths are computed but
never read back (the DP only flows to larger indices).

The start-cell scan needs the last real row and column of each pair's
matrix; those are emitted diag-indexed — lastrow_diag[d] = sw at
(reflen-1, d-reflen+1), altcol_diag[d] = sw at (d-altlen+1, altlen-1) —
as masked row-reductions, and the host maps them back to (i, j) space.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from acc_genomics_tpu.ops.sw.reference import (
    DEFAULT_SW_PARAMS,
    LOW_INIT,
    MATRIX_MIN_CUTOFF,
    OVERHANG_INDEL,
    OVERHANG_LEADING_INDEL,
    SWParams,
)

LANES = 128
I32 = jnp.int32
DMA_GROUP = 16  # diagonals staged per btrack DMA burst


def _sw_diag_kernel(
    nd_ref,  # scalar prefetch: per-block diagonal count (multiple of DMA_GROUP)
    ref_ref, alt_ext_ref, reflen_ref, altlen_ref,
    btr_out, lastrow_out, altcol_out,
    sw_buf, bgv_buf, gsv_buf, bgh_buf, gsh_buf, ad_buf, btr_stage,
    lr_stage, ac_stage, dma_sems,
    *, indel_init: bool, params: SWParams,
):
    W_MATCH, W_MISMATCH, W_OPEN, W_EXTEND = params
    rows = ref_ref.shape[0]
    n_diag = alt_ext_ref.shape[0]
    cols = n_diag - rows
    blk = pl.program_id(0)
    refc = ref_ref[:]
    reflen = reflen_ref[:]  # (1, B)
    altlen = altlen_ref[:]

    shape = refc.shape
    ii = jax.lax.broadcasted_iota(I32, shape, 0)
    row0 = ii == 0
    zero = jnp.zeros(shape, I32)
    low = jnp.full(shape, LOW_INIT, I32)

    if indel_init:
        colbnd = W_OPEN + ii * W_EXTEND  # matrix sw[i+1][0]
        colbnd_prev = jnp.where(row0, 0, W_OPEN + (ii - 1) * W_EXTEND)  # sw[i][0]
    else:
        colbnd = zero
        colbnd_prev = zero

    sw_buf[0] = zero
    sw_buf[1] = zero
    bgv_buf[0] = low
    bgv_buf[1] = low
    gsv_buf[0] = zero
    gsv_buf[1] = zero
    bgh_buf[:] = low
    gsh_buf[:] = zero
    ad_buf[:] = jnp.full(shape, 255, I32)

    last_sel = jnp.broadcast_to(reflen, shape) - 1
    altc_sel = jnp.broadcast_to(altlen, shape) - 1

    def rowbnd(d):
        # matrix sw[0][jm]: the diag shift-in at i=0 needs sw[0][d] and the
        # up-term needs sw[0][d+1]
        if indel_init:
            def ramp(jm):
                return jnp.where(jm <= 0, 0, W_OPEN + (jm - 1) * W_EXTEND)
            return ramp(d), ramp(d + 1)
        return 0, 0

    # ---- windowed wavefront phases (see ops/pairhmm/kernel.py) -----------
    # Only rows [max(0, d - alt + 1), min(d, rows - 1)] are active at
    # diagonal d; phases run static row windows.  Unlike PairHMM the
    # shifted state here is rolled at READ time, so window growth needs no
    # spillover writes; drain windows inject the boundary row's buffered
    # values (stale values only ever feed cells past every lane's alt
    # length, whose btrack/scores are never read back).

    def make_step(w0: int, W: int, boundary: bool):
        # window-shaped values are constructed directly — slicing a
        # broadcast/iota value trips Mosaic's strided-slice layout pass
        refc_w = jax.lax.slice(refc, (w0, 0), (w0 + W, LANES))
        zero_w = jnp.zeros((W, LANES), I32)
        low_w = jnp.full((W, LANES), LOW_INIT, I32)
        iiw = jax.lax.broadcasted_iota(I32, (W, LANES), 0) + w0
        if indel_init:
            colbnd_w = W_OPEN + iiw * W_EXTEND
            colbnd_prev_w = jnp.where(iiw == 0, 0, W_OPEN + (iiw - 1) * W_EXTEND)
        else:
            colbnd_w = zero_w
            colbnd_prev_w = zero_w
        last_sel_w = jnp.broadcast_to(reflen, (W, LANES)) - 1
        altc_sel_w = jnp.broadcast_to(altlen, (W, LANES)) - 1
        lrow0 = iiw == w0
        wsl = pl.ds(w0, W)
        bsl = pl.ds(w0 - 1, 1) if w0 > 0 else None  # boundary row below

        def shift_in(arr_w, bnd_buf, bnd_row0):
            """Shift down by one row; row w0 takes the boundary value:
            the absolute row-0 constant when w0 == 0, else the buffered
            row w0-1 (fresh exactly while that cell can feed an active
            cell)."""
            rolled = pltpu.roll(arr_w, 1, 0)
            if w0 == 0:
                return jnp.where(lrow0, bnd_row0, rolled)
            return jnp.where(lrow0, jnp.broadcast_to(bnd_buf, (W, LANES)), rolled)

        def step(d, cur, prv, off):
            sw1 = sw_buf[prv, wsl]  # diagonal d-1
            sw2 = sw_buf[cur, wsl]
            bgv = bgv_buf[prv, wsl]
            gsv = gsv_buf[prv, wsl]

            alt_d = alt_ext_ref[pl.ds(d - w0, 1), :]  # ad[w0] <- alt[d - w0]
            ad = jnp.where(
                lrow0,
                jnp.broadcast_to(alt_d, (W, LANES)),
                pltpu.roll(ad_buf[wsl], 1, 0),
            )
            ad_buf[wsl] = ad

            bnd_diag, bnd_up = rowbnd(d)

            wd = jnp.where(ad == refc_w, W_MATCH, W_MISMATCH)
            sw2s = shift_in(sw2, sw_buf[cur, bsl] if w0 else None, bnd_diag)
            if boundary:
                jd0 = iiw == d
                # boundary phases always run the full-prefix window
                sw2s = jnp.where(
                    jnp.logical_and(jd0, jnp.logical_not(lrow0)),
                    colbnd_prev_w, sw2s,
                )
            step_diag = sw2s + wd

            sw1s = shift_in(sw1, sw_buf[prv, bsl] if w0 else None, bnd_up)
            bgvs = shift_in(bgv, bgv_buf[prv, bsl] if w0 else None, low_w)
            gsvs = shift_in(gsv, gsv_buf[prv, bsl] if w0 else None, zero_w)
            prev_gap_v = sw1s + W_OPEN
            bgv_ext = bgvs + W_EXTEND
            take_v = prev_gap_v > bgv_ext
            bgv_n = jnp.where(take_v, prev_gap_v, bgv_ext)
            gsv_n = jnp.where(take_v, 1, gsvs + 1)

            if boundary:
                left = jnp.where(jd0, colbnd_w, sw1)  # matrix sw[i+1][j]
            else:
                left = sw1
            prev_gap_h = left + W_OPEN
            bgh_ext = bgh_buf[wsl] + W_EXTEND
            take_h = prev_gap_h > bgh_ext
            bgh_n = jnp.where(take_h, prev_gap_h, bgh_ext)
            gsh_n = jnp.where(take_h, 1, gsh_buf[wsl] + 1)
            valid = jnp.logical_and(iiw <= d, d - iiw < cols)
            bgh_n = jnp.where(valid, bgh_n, bgh_buf[wsl])
            gsh_n = jnp.where(valid, gsh_n, gsh_buf[wsl])
            bgh_buf[wsl] = bgh_n
            gsh_buf[wsl] = gsh_n

            step_down = bgv_n
            step_right = bgh_n
            use_diag = jnp.logical_and(step_diag >= step_down, step_diag >= step_right)
            use_right = jnp.logical_and(jnp.logical_not(use_diag), step_right >= step_down)
            val = jnp.where(use_diag, step_diag, jnp.where(use_right, step_right, step_down))
            sw_new = jnp.maximum(MATRIX_MIN_CUTOFF, val)
            btr = jnp.where(use_diag, 0, jnp.where(use_right, -gsh_n, gsv_n))

            sw_buf[cur, wsl] = sw_new
            bgv_buf[cur, wsl] = bgv_n
            gsv_buf[cur, wsl] = gsv_n

            # stage btrack (int16) at a static group offset; rows outside
            # the window keep stale values — the walker never reads them
            btr_stage[off, wsl] = btr.astype(jnp.int16)

            # stage the start-cell scan rows at STATIC offsets; per-step
            # dynamic single-row stores measured 42% of the whole kernel
            lr_stage[pl.ds(off, 1), :] = jnp.sum(
                jnp.where(iiw == last_sel_w, sw_new, zero_w), axis=0, keepdims=True
            )
            ac_stage[pl.ds(off, 1), :] = jnp.sum(
                jnp.where((d - iiw) == altc_sel_w, sw_new, zero_w),
                axis=0, keepdims=True,
            )

        def group(g, _):
            d0 = g * DMA_GROUP

            # the previous group's DMA must have drained before restaging
            @pl.when(g > 0)
            def _():
                pltpu.make_async_copy(
                    btr_stage,
                    btr_out.at[blk, pl.ds(d0 - DMA_GROUP, DMA_GROUP)],
                    dma_sems.at[0],
                ).wait()

            for off in range(DMA_GROUP):  # static unroll: static slots
                step(d0 + off, off % 2, (off + 1) % 2, off)

            pltpu.make_async_copy(
                btr_stage, btr_out.at[blk, pl.ds(d0, DMA_GROUP)], dma_sems.at[0]
            ).start()
            lastrow_out[pl.ds(d0, DMA_GROUP), :] = lr_stage[:]
            altcol_out[pl.ds(d0, DMA_GROUP), :] = ac_stage[:]
            return 0

        return group

    nd = nd_ref[blk]
    nv = rows // 8
    # grow milestones in diagonals, aligned to the DMA group size
    gstep = -(-((rows + 3) // 4) // DMA_GROUP) * DMA_GROUP
    milestones = []
    m = gstep
    while m < rows:
        milestones.append(m)
        m += gstep
    milestones.append(rows)
    prev = 0
    for mk in milestones:
        w_rows = min(rows, ((mk + 7) // 8) * 8)
        grp = make_step(0, w_rows, boundary=True)
        jax.lax.fori_loop(prev // DMA_GROUP, mk // DMA_GROUP, grp, 0)
        prev = mk

    # steady + drain (windows [rows - 8w, rows))
    drain_vregs = sorted(
        { (nv * k) // 4 for k in (3, 2, 1) } & set(range(1, nv)), reverse=True
    )
    starts = [
        jnp.maximum(
            jnp.int32(rows),
            ((nd - 8 * w - 1 + DMA_GROUP - 1) // DMA_GROUP) * DMA_GROUP,
        )
        for w in drain_vregs
    ]
    bounds = [jnp.int32(rows)] + starts + [nd]
    widths = [nv] + drain_vregs
    for k, w in enumerate(widths):
        grp = make_step(rows - 8 * w, 8 * w, boundary=False)
        lo_b = bounds[k] // DMA_GROUP
        hi_b = jnp.maximum(lo_b, bounds[k + 1] // DMA_GROUP)
        jax.lax.fori_loop(lo_b, hi_b, grp, 0)

    pltpu.make_async_copy(
        btr_stage,
        btr_out.at[blk, pl.ds(nd - DMA_GROUP, DMA_GROUP)],
        dma_sems.at[0],
    ).wait()


@functools.partial(jax.jit, static_argnames=("strategy", "interpret", "params"))
def sw_fill_pallas(
    ref_tm, alt_ext, reflen, altlen, strategy: int,
    block_diags=None, interpret=False,
    params: SWParams = DEFAULT_SW_PARAMS,
):
    """Diag-major fill.  ref_tm: (R, B); alt_ext: (D, B) int32 with
    D = R + C (alt chars then 255 padding).  Returns
    (btr (B//128, D, R, 128) int16 diag-major per lane block,
    lastrow_diag (D, B), altcol_diag (D, B)).

    block_diags: per-128-lane-block diagonal trip counts (multiples of
    DMA_GROUP*2, >= rows + max altlen in block); rows of the outputs at
    d >= the block's count are unwritten — every consumer masks by the
    real (reflen, altlen) ranges.
    """
    rows, bsz = ref_tm.shape
    n_diag = alt_ext.shape[0]
    if bsz % LANES:
        raise ValueError(f"batch {bsz} must be a multiple of {LANES}")
    if rows % 8:
        raise ValueError(f"rows {rows} must be a multiple of 8")
    indel_init = strategy in (OVERHANG_INDEL, OVERHANG_LEADING_INDEL)
    nblk = bsz // LANES
    if block_diags is None:
        block_diags = jnp.full((nblk,), n_diag, jnp.int32)

    grid = (nblk,)
    row_spec = pl.BlockSpec((rows, LANES), lambda b, nd: (0, b), memory_space=pltpu.VMEM)
    diag_spec = pl.BlockSpec((n_diag, LANES), lambda b, nd: (0, b), memory_space=pltpu.VMEM)
    one_spec = pl.BlockSpec((1, LANES), lambda b, nd: (0, b), memory_space=pltpu.VMEM)
    # ANY-space outputs must be whole-array; the kernel DMAs into its own
    # lane slice using program_id
    btr_spec = pl.BlockSpec(memory_space=pl.ANY)

    kernel = functools.partial(
        _sw_diag_kernel, indel_init=indel_init, params=params
    )
    btr, lastrow, altcol = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[row_spec, diag_spec, one_spec, one_spec],
            out_specs=(btr_spec, diag_spec, diag_spec),
            scratch_shapes=[
                pltpu.VMEM((2, rows, LANES), I32),  # sw diagonals
                pltpu.VMEM((2, rows, LANES), I32),  # bgv
                pltpu.VMEM((2, rows, LANES), I32),  # gsv
                pltpu.VMEM((rows, LANES), I32),  # bgh
                pltpu.VMEM((rows, LANES), I32),  # gsh
                pltpu.VMEM((rows, LANES), I32),  # alt diag register
                pltpu.VMEM((DMA_GROUP, rows, LANES), jnp.int16),  # btrack stage
                pltpu.VMEM((DMA_GROUP, LANES), I32),  # lastrow stage
                pltpu.VMEM((DMA_GROUP, LANES), I32),  # altcol stage
                pltpu.SemaphoreType.DMA((1,)),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz // LANES, n_diag, rows, LANES), jnp.int16),
            jax.ShapeDtypeStruct((n_diag, bsz), I32),
            jax.ShapeDtypeStruct((n_diag, bsz), I32),
        ),
        interpret=interpret,
    )(
        jnp.asarray(block_diags, jnp.int32),
        ref_tm.astype(I32), alt_ext.astype(I32),
        reflen.reshape(1, -1).astype(I32), altlen.reshape(1, -1).astype(I32),
    )
    return btr, lastrow, altcol


def sw_align_batch_launch(
    refs, alts, strategy: int, rows: int, cols: int,
    interpret: bool = False, mesh=None,
    params: SWParams = DEFAULT_SW_PARAMS,
):
    """Launch the fill + device walk; returns (packed device array, perm)
    without fetching — callers batch many launches into one D2H transfer
    (decode with sw_align_batch_decode)."""
    from acc_genomics_tpu.ops.sw.walker import sw_walk_device

    n_real = len(refs)
    # sort by total diagonal count so each 128-lane block runs only the
    # diagonals its longest pair needs (the PairHMM trip-count technique)
    perm = sorted(range(n_real), key=lambda k: -(len(refs[k]) + len(alts[k])))
    lane_mult = LANES * (int(mesh.shape["data"]) if mesh is not None else 1)
    bsz = ((n_real + lane_mult - 1) // lane_mult) * lane_mult
    n_diag = rows + cols
    grp = 2 * DMA_GROUP
    n_diag = ((n_diag + grp - 1) // grp) * grp
    # uint8 on the wire (codes <= 255): the device-side astype inside the
    # jit is free, and the H2D upload shrinks 4x
    ref_tm = np.full((rows, bsz), 255, np.uint8)
    alt_ext = np.full((n_diag, bsz), 255, np.uint8)
    reflen = np.ones(bsz, np.int32)
    altlen = np.ones(bsz, np.int32)
    for k, j in enumerate(perm):
        r, a = refs[j], alts[j]
        if len(r) > rows or len(a) > cols:
            raise ValueError("sequence exceeds bucket")
        ref_tm[: len(r), k] = r
        alt_ext[: len(a), k] = a
        reflen[k] = len(r)
        altlen[k] = len(a)
    # rows + max(altlen): the kernel derives its drain-phase row windows
    # from nd - rows, so nd must bound the ALT length, not just rl+al
    nd_need = rows + altlen.reshape(-1, LANES).max(axis=1)
    block_diags = np.minimum(
        (nd_need + DMA_GROUP - 1) // DMA_GROUP * DMA_GROUP, n_diag
    ).astype(np.int32)
    rl_d = jnp.asarray(reflen)
    al_d = jnp.asarray(altlen)
    if mesh is not None:
        from acc_genomics_tpu.parallel.sharded_kernels import sw_device_dp

        packed = sw_device_dp(
            mesh, jnp.asarray(ref_tm), jnp.asarray(alt_ext), rl_d, al_d,
            strategy, jnp.asarray(block_diags), params=params,
        )
    else:
        btr, lastrow_diag, altcol_diag = sw_fill_pallas(
            jnp.asarray(ref_tm), jnp.asarray(alt_ext), rl_d, al_d, strategy,
            block_diags=jnp.asarray(block_diags), interpret=interpret,
            params=params,
        )
        packed = sw_walk_device(
            btr, lastrow_diag, altcol_diag, rl_d, al_d, strategy
        )
    return packed, perm


def sw_align_batch_decode(
    packed_np, perm, refs, alts, strategy: int,
    params: SWParams = DEFAULT_SW_PARAMS,
) -> List[Tuple[list, int]]:
    """Host half: decode a fetched packed element buffer into per-pair
    (cigar, offset), rerunning overflow pairs on the host oracle."""
    from acc_genomics_tpu.ops.sw.walker import decode_elements

    n_real = len(refs)
    sorted_out, overflow = decode_elements(packed_np, n_real)
    out = [None] * n_real
    for k, j in enumerate(perm):
        out[j] = sorted_out[k]
        if overflow[k]:
            from acc_genomics_tpu.ops.sw.reference import sw_align_oracle

            out[j] = sw_align_oracle(refs[j], alts[j], strategy, params=params)
    return out


def sw_align_batch_pallas(
    refs, alts, strategy: int, rows: int, cols: int,
    interpret: bool = False, mesh=None,
    params: SWParams = DEFAULT_SW_PARAMS,
) -> List[Tuple[list, int]]:
    """Batched alignment: Pallas fill + device-side backtrack walker.

    The btrack matrix never leaves the device — only the per-pair CIGAR
    element buffers do (ops/sw/walker.py).  Pairs whose element count
    overflows the walker cap rerun on the host oracle.  Equivalent to
    ops.sw.jax_impl.sw_align_batch (exact results).
    """
    packed, perm = sw_align_batch_launch(
        refs, alts, strategy, rows, cols, interpret=interpret, mesh=mesh,
        params=params,
    )
    return sw_align_batch_decode(
        np.asarray(packed), perm, refs, alts, strategy, params=params
    )
