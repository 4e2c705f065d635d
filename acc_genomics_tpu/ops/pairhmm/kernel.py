"""Pallas TPU kernel for the batched PairHMM forward pass.

Anti-diagonal wavefront, redesigned for the VPU from the reference's
PE-array formulation (pairhmm/xlnx/device/pairhmm.cpp:83-391, where 8 HLS
PEs walk one DP matrix each in diagonal order with triple-buffered rows):

* one TPU lane  = one (read, hap) pair  -> 128 independent matrices per
  grid step (the "PU" axis of the reference becomes the lane axis),
* sublane index = read row i            -> the wavefront lives in VMEM
  as (R, 128) arrays, rotated one row per diagonal,
* the M/X/Y recurrences become ~25 fused VPU ops per diagonal; state is
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
column-0 boundary masked at i == d.

Hot-loop economies (each measured on a v5e chip):

* **cached shifted state**: the up-shifted M/X/(X+Y) needed by later
  diagonals are computed once at write time (ms/xs/ss buffers), instead
  of re-rolling each consumer — one sublane roll fewer per diagonal,
  and X needs no unshifted buffer at all.
* **bitmask base matching**: hap chars ride the shift register as
  one-hot masks (1<<c; 15 for N, 16 for padding), read bases become
  masks once in the prologue — match is a single AND+compare instead of
  two compares + two ORs (the reference precomputes per-column bitmasks
  the same way, avx-pairhmm-template.h:3-35).
* **single-vreg accumulation**: only the last 8 sublanes of X can hold
  the absorbing-row collector, so the running result sum touches one
  vreg, not the full column.
* **per-block diagonal bounds** (scalar prefetch): lanes are packed
  sorted by haplotype length, and each 128-lane block runs only
  rows + max(haplen in block) diagonals — the fori_loop trip count is a
  prefetched scalar, so short pairs never pay the bucket-max diagonal
  count (the TPU analog of the reference's trip-count load balancing,
  PairHMMFpgaInterface.cpp:106-170).

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
PAD_MASK = 16  # one-hot channel for padded hap columns (never matches)


def hap_to_mask(hap_codes):
    """hap base codes -> one-hot match masks (N matches everything, PAD
    columns never match).  Shared by the DP kernel and the SP band
    kernel so the two paths cannot drift (PARITY bit-for-bit contract)."""
    return jnp.where(
        hap_codes >= HAP_PAD,
        PAD_MASK,
        jnp.where(hap_codes == BASE_N, 15, jnp.int32(1) << hap_codes),
    ).astype(jnp.int32)


def _pairhmm_diag_kernel(
    nd_ref,  # scalar prefetch: per-block diagonal count (even)
    p_mm_ref, p_gapm_ref, p_mx_ref, p_xx_ref, p_my_ref, p_yy_ref,
    em_m_ref, em_x_ref, rs_ref, hap_ext_ref, y0_ref, out_ref,
    m_buf, y_buf, ms_buf, xs_buf, ss_buf, hd_buf, acc_buf,
):
    rows = p_mm_ref.shape[0]
    dtype = p_mm_ref.dtype

    p_mm = p_mm_ref[:]
    p_gapm = p_gapm_ref[:]
    p_mx = p_mx_ref[:]
    p_xx = p_xx_ref[:]
    p_my = p_my_ref[:]
    p_yy = p_yy_ref[:]
    em_m = em_m_ref[:]
    em_x = em_x_ref[:]

    shape = p_mm.shape
    ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    row0 = ii == 0
    not_row0 = jnp.logical_not(row0)
    rs = rs_ref[:]
    # read bases as one-hot masks; N matches everything
    rs_mask = jnp.where(rs == BASE_N, 15, jnp.int32(1) << rs)
    zero = jnp.zeros(shape, dtype)
    y0b = jnp.broadcast_to(y0_ref[:], shape)

    m_buf[0] = zero
    m_buf[1] = zero
    y_buf[0] = zero
    y_buf[1] = zero
    ms_buf[0] = zero
    ms_buf[1] = zero
    xs_buf[0] = zero
    xs_buf[1] = zero
    # ss row 0 carries the Y boundary (row -1 virtual Y = IC/haplen)
    ss0 = jnp.where(row0, y0b, zero)
    ss_buf[0] = ss0
    ss_buf[1] = ss0
    hd_buf[:] = jnp.full(shape, PAD_MASK, jnp.int32)
    acc_buf[:] = jnp.zeros(acc_buf.shape, dtype)

    last8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0) == 7
    last8 = last8.astype(dtype)

    # ---- windowed wavefront phases --------------------------------------
    # Only rows near the wavefront do useful work: at diagonal d the active
    # rows are [max(0, d - hap + 1), min(d, rows - 1)].  The loop is split
    # into phases with static row windows (vector shapes must be static):
    #   grow:   d <  rows       window [0, W), W stepping up by quarters
    #   steady: rows <= d       full window
    #   drain:  d >= nd - 8w    window [rows - 8w, rows), w stepping down
    # Inactive rows, when computed, self-zero through the PAD hd chain
    # (distm = 0 -> M = X = 0), so window edges only need the hd and ss
    # boundary injections below.  This cuts the triangular padding waste
    # the reference pays for with PU load imbalance.

    def make_step(w0: int, W: int, boundary: bool, with_acc: bool):
        lo, hi = w0, w0 + W
        sl = lambda a: jax.lax.slice(a, (lo, 0), (hi, LANES))
        p_mm_w, p_gapm_w = sl(p_mm), sl(p_gapm)
        p_mx_w, p_xx_w = sl(p_mx), sl(p_xx)
        p_my_w, p_yy_w = sl(p_my), sl(p_yy)
        em_m_w, em_x_w = sl(em_m), sl(em_x)
        rs_mask_w = sl(rs_mask)
        zero_w = jax.lax.slice(zero, (0, 0), (W, LANES))
        y0b_w = jax.lax.slice(y0b, (0, 0), (W, LANES))
        iiw = jax.lax.broadcasted_iota(jnp.int32, (W, LANES), 0) + w0
        lrow0 = iiw == w0  # local window row 0
        not_row0_w = iiw != 0
        wsl = pl.ds(w0, W)

        def step(d, hap_d, cur, prv):
            # hap mask diagonal register: hd[i] <- hapmask[d - i]; the
            # window's first row is injected (hap[d - w0]), the rest roll
            hd = jnp.where(
                lrow0,
                jnp.broadcast_to(hap_d, (W, LANES)),
                pltpu.roll(hd_buf[wsl], 1, 0),
            )
            hd_buf[wsl] = hd

            match = (hd & rs_mask_w) != 0
            distm = jnp.where(
                hd >= PAD_MASK, zero_w, jnp.where(match, em_m_w, em_x_w)
            )

            m_new = distm * (p_mm_w * ms_buf[cur, wsl] + p_gapm_w * ss_buf[cur, wsl])
            x_new = p_mx_w * ms_buf[prv, wsl] + p_xx_w * xs_buf[prv, wsl]
            y_new = p_my_w * m_buf[prv, wsl] + p_yy_w * y_buf[prv, wsl]
            if boundary:
                # column-0 masks only exist while the wavefront touches
                # j == 0 (d < rows)
                jd0 = iiw == d
                m_new = jnp.where(jnp.logical_and(jd0, not_row0_w), zero_w, m_new)
                y_new = jnp.where(jd0, zero_w, y_new)

            m_buf[cur, wsl] = m_new
            y_buf[cur, wsl] = y_new
            if w0 == 0:
                # absolute row 0: M/X shift in 0, (X+Y) shifts in the Y
                # boundary IC/haplen
                ms_buf[cur, wsl] = jnp.where(lrow0, zero_w, pltpu.roll(m_new, 1, 0))
                xs_buf[cur, wsl] = jnp.where(lrow0, zero_w, pltpu.roll(x_new, 1, 0))
                ss_buf[cur, wsl] = jnp.where(
                    lrow0, y0b_w, pltpu.roll(x_new + y_new, 1, 0)
                )
            else:
                # drain window: row w0-1 sits on a PAD column, so its
                # M = X = 0; its Y still feeds ss and is reconstructed
                # from the previous diagonal's M/Y at w0-1
                mb = m_buf[prv, pl.ds(w0 - 1, 1)]
                yb = y_buf[prv, pl.ds(w0 - 1, 1)]
                pmy_b = jax.lax.slice(p_my, (w0 - 1, 0), (w0, LANES))
                pyy_b = jax.lax.slice(p_yy, (w0 - 1, 0), (w0, LANES))
                ss_bnd = jnp.broadcast_to(pmy_b * mb + pyy_b * yb, (W, LANES))
                ms_buf[cur, wsl] = jnp.where(lrow0, zero_w, pltpu.roll(m_new, 1, 0))
                xs_buf[cur, wsl] = jnp.where(lrow0, zero_w, pltpu.roll(x_new, 1, 0))
                ss_buf[cur, wsl] = jnp.where(
                    lrow0, ss_bnd, pltpu.roll(x_new + y_new, 1, 0)
                )
            if w0 + W < rows:
                # the shift pushes row W-1's values to row w0+W, one past
                # the window: spill them so the next (larger-window) phase
                # reads fresh state at its new rows
                tail = pl.ds(w0 + W, 1)
                mt = jax.lax.slice(m_new, (W - 1, 0), (W, LANES))
                xt = jax.lax.slice(x_new, (W - 1, 0), (W, LANES))
                yt = jax.lax.slice(y_new, (W - 1, 0), (W, LANES))
                ms_buf[cur, tail] = mt
                xs_buf[cur, tail] = xt
                ss_buf[cur, tail] = xt + yt
            if with_acc:
                # only the final sublane can hold the absorbing collector
                acc_buf[:] += (
                    jax.lax.slice(x_new, (W - 8, 0), (W, LANES)) * last8
                )

        def body(d4, _):
            d = d4 * 4
            hap4 = hap_ext_ref[pl.ds(d - w0, 4), :]  # rows d-w0 .. d-w0+3
            step(d, jax.lax.slice(hap4, (0, 0), (1, LANES)), 0, 1)
            step(d + 1, jax.lax.slice(hap4, (1, 0), (2, LANES)), 1, 0)
            step(d + 2, jax.lax.slice(hap4, (2, 0), (3, LANES)), 0, 1)
            step(d + 3, jax.lax.slice(hap4, (3, 0), (4, LANES)), 1, 0)
            return 0

        return body

    nd = nd_ref[pl.program_id(0)]
    nv = rows // 8  # vreg rows
    q = max(1, -(-nv // 4))  # quarter step, in vregs

    # grow phases: windows [0, 8qk), diagonals [8q(k-1), 8qk)
    milestones = []
    m = 8 * q
    while m < rows:
        milestones.append(m)
        m += 8 * q
    milestones.append(rows)
    prev = 0
    for mk in milestones:
        body = make_step(0, mk, boundary=True, with_acc=(mk == rows))
        jax.lax.fori_loop(prev // 4, mk // 4, body, 0, unroll=False)
        prev = mk

    # steady + drain: windows [rows - 8w, rows); window w engages once
    # every active row >= rows - 8w, i.e. d >= nd - 8w - 1 (using the
    # block's nd = rows + max haplen as a conservative hap bound)
    drain_sizes = sorted({q * k for k in (3, 2, 1)} & set(range(1, nv)), reverse=True)
    starts = [
        jnp.maximum(jnp.int32(rows), ((nd - 8 * w - 1 + 3) // 4) * 4)
        for w in drain_sizes
    ]
    bounds = [jnp.int32(rows)] + starts + [nd]
    widths = [nv] + drain_sizes
    for k, w in enumerate(widths):
        body = make_step(rows - 8 * w, 8 * w, boundary=False, with_acc=True)
        lo_b = bounds[k] // 4
        hi_b = jnp.maximum(lo_b, bounds[k + 1] // 4)
        jax.lax.fori_loop(lo_b, hi_b, body, 0, unroll=False)

    out_ref[:] = jnp.sum(acc_buf[:], axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pairhmm_forward_pallas(
    p_mm, p_gapm, p_mx, p_xx, p_my, p_yy,
    em_match, em_mis, rs, hap_ext, y0,
    block_diags=None,
    interpret: bool = False,
):
    """Batched PairHMM forward via the Pallas diagonal kernel.

    Inputs are the time-major packed-batch arrays of pack.py, shaped
    (R, B) / (R + H, B) with B a multiple of 128 — exactly the host
    layout, so nothing is transposed on device.  Returns (B,) forward
    probabilities.

    block_diags: optional (B // 128,) int32 of per-block diagonal
    counts (>= rows + max haplen in block, multiple of 4).  Pack with
    sort_by_haplen=True to make the blocks tight.  None runs every
    block the full rows + cols diagonals.
    """
    rows, bsz = p_mm.shape
    n_diag_max = hap_ext.shape[0]
    if bsz % LANES:
        raise ValueError(f"batch {bsz} must be a multiple of {LANES}")
    if rows % 8:
        raise ValueError(f"rows {rows} must be a multiple of 8")
    dtype = p_mm.dtype
    nblk = bsz // LANES

    if block_diags is None:
        block_diags = jnp.full((nblk,), (n_diag_max + 3) // 4 * 4, jnp.int32)

    # hap chars -> one-hot masks once, outside the kernel (fused by XLA)
    hap_mask = hap_to_mask(hap_ext)

    coef = [p_mm, p_gapm, p_mx, p_xx, p_my, p_yy, em_match, em_mis]
    y0_row = y0.reshape(1, bsz).astype(dtype)

    row_spec = pl.BlockSpec((rows, LANES), lambda b, nd: (0, b), memory_space=pltpu.VMEM)
    diag_spec = pl.BlockSpec(
        (n_diag_max, LANES), lambda b, nd: (0, b), memory_space=pltpu.VMEM
    )
    one_spec = pl.BlockSpec((1, LANES), lambda b, nd: (0, b), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _pairhmm_diag_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblk,),
            in_specs=[row_spec] * 8 + [row_spec, diag_spec, one_spec],
            out_specs=one_spec,
            scratch_shapes=[
                pltpu.VMEM((2, rows, LANES), dtype),  # M diagonals d-1, d-2
                pltpu.VMEM((2, rows, LANES), dtype),  # Y
                pltpu.VMEM((2, rows, LANES), dtype),  # M shifted
                pltpu.VMEM((2, rows, LANES), dtype),  # X shifted
                pltpu.VMEM((2, rows, LANES), dtype),  # (X+Y) shifted
                pltpu.VMEM((rows, LANES), jnp.int32),  # hap mask shift register
                pltpu.VMEM((8, LANES), dtype),  # result accumulator vreg
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((1, bsz), dtype),
        cost_estimate=pl.CostEstimate(
            flops=13 * n_diag_max * rows * bsz,
            bytes_accessed=(9 * rows + n_diag_max) * bsz * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(block_diags, jnp.int32), *coef, rs, hap_mask, y0_row)
    return out[0]


def block_diag_counts(pack: PackedPairHMMBatch) -> np.ndarray:
    """Per-128-lane-block diagonal trip counts from packed haplens."""
    rows = pack.rows
    hl = pack.haplen.reshape(-1, LANES)
    nd = rows + hl.max(axis=1)
    # rounded to the 4-diagonal unroll; the tail's clamped hap slices read
    # PAD rows, whose columns contribute exactly zero
    return ((nd + 3) // 4 * 4).astype(np.int32)


def forward_from_pack_pallas(pack: PackedPairHMMBatch, interpret: bool = False):
    if pack.p_mm.dtype == np.float64:
        raise ValueError("the Pallas kernel is fp32; fp64 runs on host")
    bd = (
        jnp.asarray(block_diag_counts(pack)) if pack.batch % LANES == 0 else None
    )
    return pairhmm_forward_pallas(
        *[jnp.asarray(v) for v in pack.arrays()],
        block_diags=bd,
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def pairhmm_forward_pallas_packed_f32(
    big_f, big_i, meta, rows: int, interpret: bool = False,
):
    """Single-upload form of the f32-coefficient forward: ``big_f`` is
    the (8*rows + 1, B) float32 buffer (8 coefficient planes + y0 row),
    ``big_i`` the (rows + rows + cols, B) int32 buffer (rs codes +
    hap_ext), ``meta`` a (1, B) int32 side-band holding the per-block
    diagonal counts in its first B/128 slots.  Three H2D transfers
    instead of twelve — each device_put pays a full round trip on the
    dev tunnel."""
    bsz = big_f.shape[1]
    planes = [big_f[k * rows : (k + 1) * rows] for k in range(8)]
    y0 = big_f[8 * rows]
    rs = big_i[:rows]
    hap_ext = big_i[rows:]
    bd = meta[0, : bsz // LANES]
    return pairhmm_forward_pallas(
        *planes, rs, hap_ext, y0, block_diags=bd, interpret=interpret
    )


@functools.partial(
    jax.jit,
    static_argnames=("rows", "initial_constant", "interpret", "expand"),
)
def pairhmm_forward_pallas_from_quals_packed(
    big, meta, ph2pr, m2m, rows: int, initial_constant: float,
    interpret: bool = False, expand: str = "arith",
):
    """Single-upload form of the byte-plane forward: ``big`` is the
    (5*rows + rows + cols, B) uint8 buffer from the native packer (5 qual
    planes + hap_ext stacked) and ``meta`` the (3, B) int32 side-band
    (rslen, haplen, per-block diagonal counts in the first B/128 slots).
    One H2D transfer instead of eight — each device_put pays a full
    round trip on the dev tunnel."""
    bsz = big.shape[1]
    q = big[0:rows]
    i = big[rows : 2 * rows]
    d = big[2 * rows : 3 * rows]
    c = big[3 * rows : 4 * rows]
    rs = big[4 * rows : 5 * rows]
    hap_ext = big[5 * rows :]
    rslen = meta[0]
    haplen = meta[1]
    bd = meta[2, : bsz // LANES]
    return pairhmm_forward_pallas_from_quals(
        q, i, d, c, rs, hap_ext, rslen, haplen,
        ph2pr, m2m, jnp.float32(initial_constant),
        block_diags=bd, interpret=interpret, expand=expand,
    )


@functools.partial(jax.jit, static_argnames=("interpret", "expand"))
def pairhmm_forward_pallas_from_quals(
    q, i, d, c, rs, hap_ext, rslen, haplen,
    ph2pr, m2m, initial_constant,
    block_diags=None,
    interpret: bool = False,
    expand: str = "arith",
):
    """Forward pass from raw qual byte planes (PackedPairHMMQuals).

    The coefficient planes are computed ON DEVICE from the uint8 quals
    (ctx.transitions/emissions, context.py:84-118, mirroring
    baseline_impl.cpp:55-90) — so the host uploads ~1/8 the bytes of the
    fp32 coefficient packing.  Absorbing rows (row >= rslen) take the
    collector values (p_mx = p_xx = 1, everything else 0).

    expand="gather" looks coefficients up in the 128-entry ph2pr and
    triangular matchToMatch tables — bit-identical to the host tables,
    but XLA gathers are element-rate-limited (~40 ms per 8K-pair batch,
    5x the forward kernel itself).  expand="arith" (default) computes
    them: ph2pr[q] = exp2(-q*log2(10)/10), and the matchToMatch table's
    Jacobian-log construction telescopes exactly (10^log10(x) = x) to
    p_mm = 1 - min(1, ph2pr[i] + ph2pr[d]), so no gather survives.
    Measured <= 27 ulp / 1.6e-6 relative vs the tables over the full
    qual domain — far inside the 5e-3 oracle contract; the "gather"
    path remains for bit-exact cross-checks (tests compare the two).
    """
    rows, bsz = q.shape
    f32 = jnp.float32
    qi = q.astype(jnp.int32) & 127
    ii = i.astype(jnp.int32) & 127
    di = d.astype(jnp.int32) & 127
    ci = c.astype(jnp.int32) & 127
    if expand == "arith":
        cst = jnp.float32(-np.log2(10.0) / 10.0)
        pe_q = jnp.exp2(qi.astype(f32) * cst)
        pe_i = jnp.exp2(ii.astype(f32) * cst)
        pe_d = jnp.exp2(di.astype(f32) * cst)
        pe_c = jnp.exp2(ci.astype(f32) * cst)
        p_mm = jnp.float32(1.0) - jnp.minimum(jnp.float32(1.0), pe_i + pe_d)
    else:
        pe_q = jnp.take(ph2pr, qi)
        pe_i = jnp.take(ph2pr, ii)
        pe_d = jnp.take(ph2pr, di)
        pe_c = jnp.take(ph2pr, ci)
        lo = jnp.minimum(ii, di)
        hi = jnp.maximum(ii, di)
        p_mm = jnp.take(m2m, ((hi * (hi + 1)) >> 1) + lo)
    one = jnp.float32(1.0)
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, bsz), 0)
        < rslen[None, :].astype(jnp.int32)
    )
    zf = jnp.zeros((rows, bsz), f32)
    coef = [
        jnp.where(valid, p_mm, 0.0),
        jnp.where(valid, one - pe_c, 0.0),
        jnp.where(valid, pe_i, 1.0),
        jnp.where(valid, pe_c, 1.0),
        jnp.where(valid, pe_d, 0.0),
        jnp.where(valid, pe_c, 0.0),
        jnp.where(valid, one - pe_q, 0.0),
        jnp.where(valid, pe_q / 3.0, 0.0) + zf,
    ]
    y0 = jnp.where(
        haplen > 0, initial_constant / haplen.astype(f32), 0.0
    ).astype(f32)
    return pairhmm_forward_pallas(
        *coef,
        jnp.where(valid, rs.astype(jnp.int32), 0),
        hap_ext.astype(jnp.int32),
        y0,
        block_diags=block_diags,
        interpret=interpret,
    )
