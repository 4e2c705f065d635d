"""Analytical performance models and observability counters.

The reference treats analytical estimates as first-class (predicted
GCUPS from trip counts at the device clock,
pairhmm/interface/PairHMMFpgaInterface.cpp:245-259; DRAM-traffic
accounting inside the SMEM baseline, smem/host/baseline.cpp).  The TPU
equivalents below model kernel time from shapes so schedulers and
dashboards can predict before running.
"""

from __future__ import annotations

import dataclasses

# rough v5e single-core figures used by the models
VPU_LANES = 8 * 128
CLOCK_HZ = 940e6
HBM_BYTES_PER_SEC = 8.0e11


@dataclasses.dataclass
class KernelEstimate:
    seconds: float
    cells: int

    @property
    def gcups(self) -> float:
        return self.cells / self.seconds / 1e9 if self.seconds else 0.0


def pairhmm_estimate(batch: int, rows: int, cols: int, ops_per_diag: int = 33):
    """Diagonal-kernel time model: (rows+cols) diagonals, each ~ops_per_diag
    vector ops over (rows, 128) registers, per 128-lane block."""
    blocks = -(-batch // 128)
    diagonals = rows + cols
    vregs = -(-rows // 8)
    cycles = blocks * diagonals * ops_per_diag * vregs
    return KernelEstimate(cycles / CLOCK_HZ, batch * rows * cols)


def sw_estimate(batch: int, rows: int, cols: int, ops_per_diag: int = 40):
    blocks = -(-batch // 128)
    diagonals = rows + cols
    vregs = -(-rows // 8)
    compute = blocks * diagonals * ops_per_diag * vregs / CLOCK_HZ
    # btrack writeback: int16 per cell over the diag-major dump
    bytes_out = blocks * diagonals * rows * 128 * 2
    return KernelEstimate(
        max(compute, bytes_out / HBM_BYTES_PER_SEC), batch * rows * cols
    )


def smem_traffic_bytes(n_probes: int) -> int:
    """HBM bytes per SMEM run: each bwt_extend issues two occ probes of one
    checkpoint row (16B) + four packed words (16B) — the TPU version of the
    reference's per-bank DRAM accounting."""
    return n_probes * 2 * 32
