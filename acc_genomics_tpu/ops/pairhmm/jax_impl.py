"""Pure-XLA batched PairHMM forward pass.

A row-wise lax.scan over the read dimension: M and X rows are elementwise
functions of the previous row; the within-row Y recurrence
``y[c] = a[c] + pYY * y[c-1]`` is a first-order linear recurrence evaluated
with ``lax.associative_scan`` (log-depth, fully lane-parallel) — the XLA
analog of the reference AVX stripe kernel's shift-carry
(pairhmm/xlnx/host/avx-pairhmm-template.h:210-346), redesigned for a
1024-lane vector machine instead of 8-lane AVX.

Variable lengths are handled by the packed-batch absorbing-row layout
(see pack.py) so the whole scan is dense with no per-pair control flow.
This implementation runs on any XLA backend and is the golden-fast path
the Pallas kernel is checked against.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from acc_genomics_tpu.ops.pairhmm.pack import PackedPairHMMBatch
from acc_genomics_tpu.utils.convert import BASE_N, HAP_PAD


def _linear_scan(a: jnp.ndarray, b: jnp.ndarray, axis: int) -> jnp.ndarray:
    """y[i] = a[i] + b[i] * y[i-1] along ``axis`` (y[-1] = 0)."""

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a2 + b2 * a1, b1 * b2

    y, _ = jax.lax.associative_scan(combine, (a, b), axis=axis)
    return y


@functools.partial(jax.jit, static_argnames=("unroll",))
def pairhmm_forward(
    p_mm, p_gapm, p_mx, p_xx, p_my, p_yy,
    em_match, em_mis, rs, hap, y0,
    unroll: int = 1,
):
    """Batched forward probability.

    All (B, R) coefficient arrays must have absorbing rows beyond each
    read's length; hap is (B, H) with HAP_PAD sentinels.  Returns (B,)
    raw forward probabilities (dtype of the coefficients).
    """
    dtype = p_mm.dtype
    bsz, cols = hap.shape
    hap_is_n = (hap == BASE_N)
    hap_is_pad = (hap >= HAP_PAD)

    # scan inputs: per-row slices, time-major (R, B)
    xs = tuple(
        jnp.swapaxes(v, 0, 1)
        for v in (p_mm, p_gapm, p_mx, p_xx, p_my, p_yy, em_match, em_mis, rs)
    )

    m0 = jnp.zeros((bsz, cols + 1), dtype)
    x0 = jnp.zeros((bsz, cols + 1), dtype)
    yrow0 = jnp.broadcast_to(y0[:, None], (bsz, cols + 1)).astype(dtype)

    zero_col = jnp.zeros((bsz, 1), dtype)

    def step(carry, row):
        m_prev, x_prev, y_prev = carry
        (c_mm, c_gapm, c_mx, c_xx, c_my, c_yy, e_m, e_x, rs_r) = row
        match = (hap == rs_r[:, None]) | (rs_r == BASE_N)[:, None] | hap_is_n
        distm = jnp.where(
            hap_is_pad, dtype.type(0), jnp.where(match, e_m[:, None], e_x[:, None])
        )
        m_body = distm * (
            m_prev[:, :-1] * c_mm[:, None]
            + (x_prev[:, :-1] + y_prev[:, :-1]) * c_gapm[:, None]
        )
        m_new = jnp.concatenate([zero_col, m_body], axis=1)
        x_new = m_prev * c_mx[:, None] + x_prev * c_xx[:, None]
        # y[c] = m_new[c-1]*pMY + pYY*y[c-1]; y[0] = 0
        a = jnp.concatenate([zero_col, m_new[:, :-1] * c_my[:, None]], axis=1)
        b = jnp.concatenate(
            [zero_col, jnp.broadcast_to(c_yy[:, None], (bsz, cols))], axis=1
        )
        y_new = _linear_scan(a, b, axis=1)
        return (m_new, x_new, y_new), None

    (m_f, x_f, _), _ = jax.lax.scan(
        step, (m0, x0, yrow0), xs, unroll=unroll
    )
    del m_f  # absorbing rows fold M into X; final row M is all zero
    return x_f.sum(axis=1)


def pairhmm_loglik(result, log10_initial_constant):
    """log10(result) - LOG10_INITIAL_CONSTANT (FalconPairHMM.cpp:634-656)."""
    return jnp.log10(result) - log10_initial_constant


def forward_from_pack(pack: PackedPairHMMBatch, unroll: int = 1):
    """Convenience wrapper over numpy-packed batches."""
    if pack.p_mm.dtype == np.float64 and not jax.config.jax_enable_x64:
        # Without x64, jax silently casts to f32 and INITIAL_CONSTANT=2^1020
        # overflows to inf.  The engine's fp64 underflow-recompute path uses
        # the NumPy oracle instead (engine/dispatch.py); direct fp64 use of
        # the jax path requires x64.
        raise ValueError(
            "fp64 PairHMM via jax requires jax_enable_x64; use the NumPy "
            "oracle for host-side fp64 recompute"
        )
    return pairhmm_forward(
        jnp.asarray(pack.p_mm), jnp.asarray(pack.p_gapm),
        jnp.asarray(pack.p_mx), jnp.asarray(pack.p_xx),
        jnp.asarray(pack.p_my), jnp.asarray(pack.p_yy),
        jnp.asarray(pack.em_match), jnp.asarray(pack.em_mis),
        jnp.asarray(pack.rs), jnp.asarray(pack.hap),
        jnp.asarray(pack.y0), unroll=unroll,
    )
