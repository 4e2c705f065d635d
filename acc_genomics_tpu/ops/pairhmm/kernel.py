"""Pallas TPU kernel for the batched PairHMM forward pass.

Anti-diagonal wavefront, redesigned for the VPU from the reference's
PE-array formulation (pairhmm/xlnx/device/pairhmm.cpp:83-391, where 8 HLS
PEs walk one DP matrix each in diagonal order with triple-buffered rows):

* one TPU lane  = one (read, hap) pair  -> 128 independent matrices per
  grid step (the "PU" axis of the reference becomes the lane axis),
* sublane index = read row i            -> the wavefront lives in VMEM
  as (R, 128) arrays, rotated one row per diagonal,
* the M/X/Y recurrences become ~30 fused VPU ops per diagonal; state is
  double-buffered in VMEM scratch (the TPU analog of the reference's
  buff[pe][3][len] rotating diagonal buffers), indexed with *static*
  slots by unrolling two diagonals per loop iteration.  (Large rotating
  loop-carry tuples trip Mosaic layout/regalloc bugs on this toolchain;
  scratch refs with static indices compile cleanly.)

Cell (i, j) (0-based read x hap) is updated at diagonal d = i + j:
    M[d](i) = distm(i, j) * (pMM(i) * M[d-2](i-1) + pGapM(i) * (X+Y)[d-2](i-1))
    X[d](i) = pMX(i) * M[d-1](i-1) + pXX(i) * X[d-1](i-1)
    Y[d](i) = pMY(i) * M[d-1](i)   + pYY(i) * Y[d-1](i)
with row-0 boundary (0, 0, IC/haplen) injected by the shift and the
column-0 boundary masked at i == d.  The hap character for column j
rides a shift register hd(i) = hap[d - i] fed from an extended hap
array (HAP_PAD beyond haplen).

Variable lengths use the absorbing-row layout of pack.py: the final row
R-1 is an absorbing collector for every pair, so the result is simply
the running sum of X[d](R-1) — no per-pair gathers anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from acc_genomics_tpu.ops.pairhmm.pack import PackedPairHMMBatch
from acc_genomics_tpu.utils.convert import BASE_N, HAP_PAD

LANES = 128


def _pairhmm_diag_kernel(
    p_mm_ref, p_gapm_ref, p_mx_ref, p_xx_ref, p_my_ref, p_yy_ref,
    em_m_ref, em_x_ref, rs_ref, hap_ext_ref, y0_ref, out_ref,
    m_buf, x_buf, y_buf, hd_buf, acc_buf,
):
    rows = p_mm_ref.shape[0]
    n_diag = hap_ext_ref.shape[0]
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

    shape = p_mm.shape
    ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    row0 = ii == 0
    not_row0 = jnp.logical_not(row0)
    rs_is_n = rs == BASE_N
    last_mask = (ii == rows - 1).astype(dtype)
    zero = jnp.zeros(shape, dtype)
    y0b = jnp.broadcast_to(y0_ref[:], shape)

    m_buf[0] = zero
    m_buf[1] = zero
    x_buf[0] = zero
    x_buf[1] = zero
    y_buf[0] = zero
    y_buf[1] = zero
    hd_buf[:] = jnp.zeros(shape, jnp.int32)
    acc_buf[:] = zero

    def step(d, cur, prv):
        # slot `prv` holds diagonal d-1; slot `cur` holds d-2 (overwritten)
        m1 = m_buf[prv]
        m2 = m_buf[cur]
        x1 = x_buf[prv]
        x2 = x_buf[cur]
        y1 = y_buf[prv]
        y2 = y_buf[cur]

        # haplotype diagonal register: hd[i] <- hap[d - i]
        hap_d = hap_ext_ref[pl.ds(d, 1), :]  # (1, B)
        hd = jnp.where(row0, jnp.broadcast_to(hap_d, shape), pltpu.roll(hd_buf[:], 1, 0))
        hd_buf[:] = hd

        jd0 = ii == d  # cells in column j == 0 this diagonal
        colb = jnp.logical_and(jd0, not_row0)

        match = (hd == rs) | rs_is_n | (hd == BASE_N)
        distm = jnp.where(hd >= HAP_PAD, zero, jnp.where(match, em_m, em_x))

        m2s = jnp.where(row0, zero, pltpu.roll(m2, 1, 0))
        s2s = jnp.where(row0, y0b, pltpu.roll(x2 + y2, 1, 0))
        m_new = distm * (p_mm * m2s + p_gapm * s2s)
        m_new = jnp.where(colb, zero, m_new)

        m1s = jnp.where(row0, zero, pltpu.roll(m1, 1, 0))
        x1s = jnp.where(row0, zero, pltpu.roll(x1, 1, 0))
        x_new = p_mx * m1s + p_xx * x1s

        y_new = jnp.where(jd0, zero, p_my * m1 + p_yy * y1)

        m_buf[cur] = m_new
        x_buf[cur] = x_new
        y_buf[cur] = y_new
        acc_buf[:] += x_new * last_mask

    def body(d2, _):
        d = d2 * 2
        step(d, 0, 1)
        step(d + 1, 1, 0)
        return 0

    jax.lax.fori_loop(0, n_diag // 2, body, 0)
    out_ref[:] = jnp.sum(acc_buf[:], axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pairhmm_forward_pallas(
    p_mm, p_gapm, p_mx, p_xx, p_my, p_yy,
    em_match, em_mis, rs, hap_ext, y0,
    interpret: bool = False,
):
    """Batched PairHMM forward via the Pallas diagonal kernel.

    Inputs are the time-major packed-batch arrays of pack.py, shaped
    (R, B) / (R + H, B) with B a multiple of 128 — exactly the host
    layout, so nothing is transposed on device.  Returns (B,) forward
    probabilities.
    """
    rows, bsz = p_mm.shape
    n_diag = hap_ext.shape[0]
    if bsz % LANES:
        raise ValueError(f"batch {bsz} must be a multiple of {LANES}")
    dtype = p_mm.dtype

    coef = [p_mm, p_gapm, p_mx, p_xx, p_my, p_yy, em_match, em_mis]
    rs_tm = rs
    y0_row = y0.reshape(1, bsz).astype(dtype)

    grid = (bsz // LANES,)
    row_spec = pl.BlockSpec((rows, LANES), lambda b: (0, b), memory_space=pltpu.VMEM)
    diag_spec = pl.BlockSpec((n_diag, LANES), lambda b: (0, b), memory_space=pltpu.VMEM)
    one_spec = pl.BlockSpec((1, LANES), lambda b: (0, b), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _pairhmm_diag_kernel,
        grid=grid,
        in_specs=[row_spec] * 8 + [row_spec, diag_spec, one_spec],
        out_specs=one_spec,
        out_shape=jax.ShapeDtypeStruct((1, bsz), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows, LANES), dtype),  # M diagonals d-1, d-2
            pltpu.VMEM((2, rows, LANES), dtype),  # X
            pltpu.VMEM((2, rows, LANES), dtype),  # Y
            pltpu.VMEM((rows, LANES), jnp.int32),  # hap shift register
            pltpu.VMEM((rows, LANES), dtype),  # result accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=15 * n_diag * rows * bsz,
            bytes_accessed=(9 * rows + n_diag) * bsz * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*coef, rs_tm, hap_ext, y0_row)
    return out[0]


def forward_from_pack_pallas(pack: PackedPairHMMBatch, interpret: bool = False):
    if pack.p_mm.dtype == np.float64:
        raise ValueError("the Pallas kernel is fp32; fp64 runs on host")
    return pairhmm_forward_pallas(
        *[jnp.asarray(v) for v in pack.arrays()], interpret=interpret
    )
