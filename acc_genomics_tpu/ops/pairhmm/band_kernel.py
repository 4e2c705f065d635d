"""Chunked PairHMM band kernel — the Pallas local body for DP x SP.

Sequence parallelism shards haplotype columns over the mesh "seq" axis;
the wavefront dependency then crosses shards.  The round-2 SP body was
the portable XLA row scan (parallel/sharded.py:_sp_forward_local) — an
order of magnitude slower per shard than the Pallas diagonal kernel.
This module provides the Pallas replacement: a kernel that advances a
CHUNK of C read-rows across a shard's hap-column slab, taking the
previous chunk's bottom row and the left neighbour's edge column as
boundary streams and emitting its own bottom row and right edge.

parallel/sharded.py composes it into the skewed chunk pipeline (shard k
runs chunk t-k at superstep t; edges ride one ppermute per superstep) —
the "row-chunked hybrid: Pallas inner, collective outer" design.  Same
role as the reference's host-side segmentation of oversized haplotypes
(pairhmm/host/PairHMMFpga.cpp:284-332), but the segments advance in an
ICI pipeline instead of sequential host calls.

Cell recurrences are the DP kernel's exactly (ops/pairhmm/kernel.py
_pairhmm_diag_kernel); boundary values arrive via streams instead of
in-kernel masking:

  top    row 0 of the chunk reads the previous chunk's bottom row via
         the shifted streams PM/PX/PS (position k holds column k-1;
         position 0 is the corner M/X/S at (r0-1, c0-1)),
  left   the wavefront's column-0 cell at step t (= local row t) reads
         the left neighbour's edge arrays E_m/E_y/E_s (position k holds
         edge row r0-1+k).

Geometry (all static): C chunk rows (multiple of 8), hc slab columns.
Diagonal steps t = 0 .. hc+C-2 (padded to a multiple of 8); the cell at
(local row li, slab column j) computes at t = li + j.  Bottom-row
outputs land at stream position p = t (column j at p = j + C - 1);
callers slice [C-1, C-1+hc).  Pad columns (hap mask PAD) self-zero
through distm, and X stays identically 0 down pad columns, so the
padded step tail writes only zeros/garbage into pad positions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from acc_genomics_tpu.ops.pairhmm.kernel import (  # shared encoding:
    PAD_MASK,      # the DP kernel and the band kernel must agree
    hap_to_mask,   # bit-for-bit on base/pad masks
)

LANES = 128


def _round8(n):
    return (n + 7) // 8 * 8


def _make_band_kernel(C: int, hc: int, n_steps_pad: int):
    def kernel(
        # inputs
        p_mm_ref, p_gapm_ref, p_mx_ref, p_xx_ref, p_my_ref, p_yy_ref,
        em_m_ref, em_x_ref, rs_ref,          # (C, L) chunk rows
        hap_ref,                              # (n_steps_pad + 8, L) hap masks
        pm_ref, px_ref, ps_ref,               # (n_steps_pad + 8, L) top streams
        e_m_ref, e_y_ref, e_s_ref,            # (C + 8, L) left edge streams
        # outputs
        bot_m_ref, bot_x_ref, bot_s_ref,      # (n_steps_pad, L) bottom row
        edge_m_ref, edge_y_ref, edge_s_ref,   # (C, L) right edge
        # scratch
        m_buf, y_buf, ms_buf, xs_buf, ss_buf, hd_buf, stage,
    ):
        dtype = p_mm_ref.dtype
        p_mm = p_mm_ref[:]
        p_gapm = p_gapm_ref[:]
        p_mx = p_mx_ref[:]
        p_xx = p_xx_ref[:]
        p_my = p_my_ref[:]
        p_yy = p_yy_ref[:]
        em_m = em_m_ref[:]
        em_x = em_x_ref[:]
        rs = rs_ref[:]
        rs_mask = jnp.where(rs == 4, 15, jnp.int32(1) << rs)

        shape = (C, LANES)
        zero = jnp.zeros(shape, dtype)
        iiw = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        row0 = iiw == 0

        m_buf[0] = zero
        m_buf[1] = zero
        y_buf[0] = zero
        y_buf[1] = zero
        ms_buf[0] = zero
        ms_buf[1] = zero
        xs_buf[0] = zero
        xs_buf[1] = zero
        ss_buf[0] = zero
        ss_buf[1] = zero
        hd_buf[:] = jnp.full(shape, PAD_MASK, jnp.int32)
        edge_m_ref[:] = jnp.zeros(edge_m_ref.shape, dtype)
        edge_y_ref[:] = jnp.zeros(edge_y_ref.shape, dtype)
        edge_s_ref[:] = jnp.zeros(edge_s_ref.shape, dtype)

        def bcast(ref, k):
            return jnp.broadcast_to(ref[pl.ds(k, 1)], shape)

        def last_row(v):
            return jax.lax.slice(v, (C - 1, 0), (C, LANES))

        def step(t, s, cur, prv):
            """One diagonal step; s = static position within the 8-group."""
            # top-row injections (shifted streams: position t <-> col t-1)
            top_m = bcast(pm_ref, t)
            top_m1 = bcast(pm_ref, t + 1)
            top_x1 = bcast(px_ref, t + 1)
            top_s = bcast(ps_ref, t)
            # left-edge injections fire while the wavefront is at column 0
            # (local row li == t < C); clamp the loads once t is past C
            tc = jnp.minimum(t, C + 6)
            lrow = iiw == t
            el_m = bcast(e_m_ref, tc)
            el_m1 = bcast(e_m_ref, tc + 1)
            el_y1 = bcast(e_y_ref, tc + 1)
            el_s = bcast(e_s_ref, tc)

            hd = jnp.where(
                row0,
                bcast(hap_ref, t).astype(jnp.int32),
                pltpu.roll(hd_buf[:], 1, 0),
            )
            hd_buf[:] = hd
            match = (hd & rs_mask) != 0
            distm = jnp.where(
                hd >= PAD_MASK, zero, jnp.where(match, em_m, em_x)
            )

            ms_eff = jnp.where(row0, top_m, ms_buf[cur])
            ms_eff = jnp.where(lrow, el_m, ms_eff)
            ss_eff = jnp.where(row0, top_s, ss_buf[cur])
            ss_eff = jnp.where(lrow, el_s, ss_eff)
            m_new = distm * (p_mm * ms_eff + p_gapm * ss_eff)

            msp_eff = jnp.where(row0, top_m1, ms_buf[prv])
            xsp_eff = jnp.where(row0, top_x1, xs_buf[prv])
            x_new = p_mx * msp_eff + p_xx * xsp_eff

            mp_eff = jnp.where(lrow, el_m1, m_buf[prv])
            yp_eff = jnp.where(lrow, el_y1, y_buf[prv])
            y_new = p_my * mp_eff + p_yy * yp_eff

            s_new = x_new + y_new
            m_buf[cur] = m_new
            y_buf[cur] = y_new
            ms_buf[cur] = pltpu.roll(m_new, 1, 0)
            xs_buf[cur] = pltpu.roll(x_new, 1, 0)
            ss_buf[cur] = pltpu.roll(s_new, 1, 0)

            # bottom-row staging at the static sub-position s
            stage[0, pl.ds(s, 1)] = last_row(m_new)
            stage[1, pl.ds(s, 1)] = last_row(x_new)
            stage[2, pl.ds(s, 1)] = last_row(s_new)
            return m_new, y_new, s_new

        def group(g, _):
            t0 = g * 8
            acc_m = zero
            acc_y = zero
            acc_s = zero
            for s in range(8):
                t = t0 + s
                m_new, y_new, s_new = step(t, s, s % 2, 1 - s % 2)
                # right edge: column hc-1 sits at local row li = t-(hc-1)
                hit = iiw == t - (hc - 1)
                acc_m = acc_m + jnp.where(hit, m_new, zero)
                acc_y = acc_y + jnp.where(hit, y_new, zero)
                acc_s = acc_s + jnp.where(hit, s_new, zero)
            edge_m_ref[:] += acc_m
            edge_y_ref[:] += acc_y
            edge_s_ref[:] += acc_s
            bot_m_ref[pl.ds(t0, 8)] = stage[0]
            bot_x_ref[pl.ds(t0, 8)] = stage[1]
            bot_s_ref[pl.ds(t0, 8)] = stage[2]
            return 0

        jax.lax.fori_loop(0, n_steps_pad // 8, group, 0, unroll=False)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def pairhmm_band_chunk(
    coef_rows,      # (8, C, B) f32: p_mm p_gapm p_mx p_xx p_my p_yy em_m em_x
    rs_rows,        # (C, B) int32 read codes for the chunk rows
    hap_mask,       # (hc, B) int32 one-hot hap masks for the slab
    top_m, top_x, top_s,   # (hc + 1, B): position 0 = corner (r0-1, c0-1),
                           # positions 1.. = prev chunk bottom at cols 0..
    edge_m, edge_y, edge_s,  # (C + 1, B): edge rows r0-1 .. r0+C-1
    interpret: bool = False,
):
    """Run one (C rows x hc cols) band chunk for every lane.

    Returns (bot_m, bot_x, bot_s) each (hc, B) — the chunk's bottom row —
    and (redge_m, redge_y, redge_s) each (C, B) — its right-edge column.
    B must be a multiple of 128; C a multiple of 8.
    """
    n8, C, bsz = coef_rows.shape
    hc = hap_mask.shape[0]
    if C % 8:
        raise ValueError(f"chunk rows {C} must be a multiple of 8")
    if bsz % LANES:
        # pad lanes to the vreg width; pad lanes carry all-zero state
        # (hap mask PAD) and are sliced off below
        pad = LANES - bsz % LANES
        padw = lambda a, v=0: jnp.pad(a, ((0, 0), (0, pad)), constant_values=v)
        outs = pairhmm_band_chunk(
            padw(coef_rows.reshape(-1, bsz)).reshape(n8, C, bsz + pad),
            padw(rs_rows), padw(hap_mask, PAD_MASK),
            padw(top_m), padw(top_x), padw(top_s),
            padw(edge_m), padw(edge_y), padw(edge_s),
            interpret=interpret,
        )
        return tuple(o[:, :bsz] for o in outs)
    dtype = coef_rows.dtype
    n_steps_pad = _round8(hc + C - 1)
    nblk = bsz // LANES

    def pad_rows(a, n):
        return jnp.concatenate(
            [a, jnp.zeros((n - a.shape[0],) + a.shape[1:], a.dtype)]
        )

    hap_pad = jnp.concatenate(
        [
            hap_mask,
            jnp.full((n_steps_pad + 8 - hc, bsz), PAD_MASK, hap_mask.dtype),
        ]
    )
    pm = pad_rows(top_m.astype(dtype), n_steps_pad + 8)
    px = pad_rows(top_x.astype(dtype), n_steps_pad + 8)
    ps = pad_rows(top_s.astype(dtype), n_steps_pad + 8)
    em_ = pad_rows(edge_m.astype(dtype), C + 8)
    ey_ = pad_rows(edge_y.astype(dtype), C + 8)
    es_ = pad_rows(edge_s.astype(dtype), C + 8)

    chunk_spec = pl.BlockSpec((C, LANES), lambda b: (0, b), memory_space=pltpu.VMEM)
    stream_spec = pl.BlockSpec(
        (n_steps_pad + 8, LANES), lambda b: (0, b), memory_space=pltpu.VMEM
    )
    edge_spec = pl.BlockSpec((C + 8, LANES), lambda b: (0, b), memory_space=pltpu.VMEM)
    bot_spec = pl.BlockSpec(
        (n_steps_pad, LANES), lambda b: (0, b), memory_space=pltpu.VMEM
    )
    out_edge_spec = pl.BlockSpec((C, LANES), lambda b: (0, b), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        _make_band_kernel(C, hc, n_steps_pad),
        grid=(nblk,),
        in_specs=[chunk_spec] * 9 + [stream_spec] * 4 + [edge_spec] * 3,
        out_specs=[bot_spec] * 3 + [out_edge_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((n_steps_pad, bsz), dtype)] * 3
        + [jax.ShapeDtypeStruct((C, bsz), dtype)] * 3,
        scratch_shapes=[
            pltpu.VMEM((2, C, LANES), dtype),  # M diagonals d-1, d-2
            pltpu.VMEM((2, C, LANES), dtype),  # Y
            pltpu.VMEM((2, C, LANES), dtype),  # M shifted
            pltpu.VMEM((2, C, LANES), dtype),  # X shifted
            pltpu.VMEM((2, C, LANES), dtype),  # (X+Y) shifted
            pltpu.VMEM((C, LANES), jnp.int32),  # hap mask shift register
            pltpu.VMEM((3, 8, LANES), dtype),  # bottom-row staging group
        ],
        cost_estimate=pl.CostEstimate(
            flops=13 * n_steps_pad * C * bsz,
            bytes_accessed=(9 * C + 7 * n_steps_pad) * bsz * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        *[coef_rows[k] for k in range(8)], rs_rows,
        hap_pad, pm, px, ps, em_, ey_, es_,
    )
    bot_m, bot_x, bot_s, redge_m, redge_y, redge_s = outs
    sl = lambda a: jax.lax.slice(a, (C - 1, 0), (C - 1 + hc, bsz))
    return sl(bot_m), sl(bot_x), sl(bot_s), redge_m, redge_y, redge_s

