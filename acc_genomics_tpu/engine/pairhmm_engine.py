"""Single-chip PairHMM engine: bucket -> pack -> device kernel -> epilogue.

The TPU redesign of the reference's production dispatch path
(FalconPairHMM::computePairhmm, pairhmm/xlnx/host/FalconPairHMM.cpp:571-664):

* segmentation + length sorting  -> shape bucketing (engine/bucketing.py)
* PU load balancing              -> dense 128-lane blocks per bucket
* worthFPGA cost model           -> small batches run on the host CPU
  backend instead of the accelerator (same jit'd code, CPU device)
* fp32 underflow (< MIN_ACCEPTED) -> per-pair fp64 recompute with the
  NumPy oracle on host, exactly the AVX-double recompute contract
  (FalconPairHMM.cpp:634-656, PairHMMWorker.cpp:157-197)
* final output: log10(result) - LOG10_INITIAL_CONSTANT per pair.

jit caching per bucket shape replaces the reference's per-board kernel
geometry; the first call on a new shape pays one compile.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from acc_genomics_tpu.config import PairHMMConfig
from acc_genomics_tpu.engine.bucketing import plan_buckets
from acc_genomics_tpu.ops.pairhmm.context import PairHMMContext
from acc_genomics_tpu.ops.pairhmm.jax_impl import pairhmm_forward
from acc_genomics_tpu.ops.pairhmm.kernel import (
    pairhmm_forward_pallas_from_quals,
    block_diag_counts,
    pairhmm_forward_pallas,
)
from acc_genomics_tpu.ops.pairhmm.pack import pack_pairhmm_batch
from acc_genomics_tpu.ops.pairhmm.reference import pairhmm_oracle
from acc_genomics_tpu.utils.timer import Timer


class PairHMMEngine:
    """Computes log10 P(read | hap) for batches of (read, hap) pairs."""

    def __init__(
        self,
        config: PairHMMConfig = PairHMMConfig(),
        device: Optional[jax.Device] = None,
        use_pallas: Optional[bool] = None,
        mesh=None,
    ):
        self.config = config
        self.device = device or jax.devices()[0]
        on_tpu = self.device.platform == "tpu"
        self.use_pallas = on_tpu if use_pallas is None else use_pallas
        # optional device mesh: batches shard over its "data" axis
        # (the Blaze multi-worker tiling analog, shard_map-based)
        self.mesh = mesh
        self._data_size = int(mesh.shape["data"]) if mesh is not None else 1
        self.ctx32 = PairHMMContext(np.float32)
        # cost-model threshold: below this many cells the accelerator
        # round-trip is not worth it (worthFPGA analog)
        self.min_device_cells = 2_000_000
        self.stats = {"pairs": 0, "recomputed": 0, "cells": 0, "device_calls": 0}
        # device-resident lookup tables for the byte-plane upload path
        # (uploaded once; coefficient planes are computed on device)
        self._tables = None

    # -- core ------------------------------------------------------------

    def _launch_bucket(self, tcs: Sequence[dict], rows: int, cols: int):
        """Pack + enqueue one bucket; returns (pack, device future).

        Dispatch is async (JAX) so packing of the next bucket overlaps
        device compute of this one — the TPU analog of the reference's
        boost-threaded double-buffered host pipeline
        (bwa-sw/intel/aocl/src/main_cl.cpp KernelWorker).
        """
        if self.use_pallas and self.mesh is None:
            # byte-plane path: upload uint8 quals/codes (~1/8 the bytes)
            # and compute the coefficient planes on device
            from acc_genomics_tpu.ops.pairhmm.pack import pack_pairhmm_quals

            pack = pack_pairhmm_quals(
                tcs, rows=rows, cols=cols, sort_by_haplen=True,
            )
            self.stats["cells"] += pack.cells
            self.stats["device_calls"] += 1
            if self._tables is None:
                self._tables = (
                    jax.device_put(
                        jnp.asarray(self.ctx32.ph2pr.astype(np.float32)),
                        self.device,
                    ),
                    jax.device_put(
                        jnp.asarray(
                            self.ctx32.match_to_match.astype(np.float32)
                        ),
                        self.device,
                    ),
                )
            bd = jax.device_put(
                np.asarray(block_diag_counts(pack)), self.device
            )
            res = pairhmm_forward_pallas_from_quals(
                jnp.asarray(pack.q), jnp.asarray(pack.i),
                jnp.asarray(pack.d), jnp.asarray(pack.c),
                jnp.asarray(pack.rs), jnp.asarray(pack.hap_ext),
                jnp.asarray(pack.rslen), jnp.asarray(pack.haplen),
                *self._tables,
                np.float32(self.ctx32.initial_constant),
                block_diags=bd,
            )
            return pack, res
        # sorted packing keeps per-128-lane-block diagonal bounds tight on
        # the Pallas path (the reference's sortReads, FalconPairHMM.cpp:268)
        pack = pack_pairhmm_batch(
            tcs, rows=rows, cols=cols, dtype=np.float32,
            sort_by_haplen=self.use_pallas,
            lane_multiple=128 * self._data_size,
        )
        self.stats["cells"] += pack.cells
        self.stats["device_calls"] += 1
        if self.mesh is not None:
            from acc_genomics_tpu.parallel.sharded import (
                pairhmm_forward_dp,
                pairhmm_forward_dp_pallas,
            )

            args = [jnp.asarray(v) for v in pack.arrays()]
            if self.use_pallas:
                bd = jnp.asarray(block_diag_counts(pack))
                res = pairhmm_forward_dp_pallas(
                    self.mesh, *args, block_diags=bd
                )
            else:
                res = pairhmm_forward_dp(self.mesh, *args)
            return pack, res
        args = [jax.device_put(v, self.device) for v in pack.arrays()]
        if self.use_pallas:
            bd = jax.device_put(
                np.asarray(block_diag_counts(pack)), self.device
            )
            res = pairhmm_forward_pallas(*args, block_diags=bd)
        else:
            res = pairhmm_forward(*args)
        return pack, res

    def _run_bucket(self, tcs: Sequence[dict], rows: int, cols: int) -> np.ndarray:
        pack, res = self._launch_bucket(tcs, rows, cols)
        return pack.unsort(np.asarray(res))

    def compute_pairs(self, testcases: Sequence[dict]) -> np.ndarray:
        """log10-likelihood for each testcase dict (rs,q,i,d,c,hap).

        Mirrors computePairhmm semantics: fp32 on device, fp64 host
        recompute for results below MIN_ACCEPTED.
        """
        n = len(testcases)
        if n == 0:
            return np.zeros(0, np.float64)
        self.stats["pairs"] += n
        read_lens = [len(t["rs"]) for t in testcases]
        hap_lens = [len(t["hap"]) for t in testcases]

        # worthFPGA-analog cost gate (FalconPairHMM.cpp:112-139): tiny
        # workloads skip the accelerator round trip and run on the native
        # C++ host engine (the reference's AVX-path role)
        total_cells = sum(r * h for r, h in zip(read_lens, hap_lens))
        if total_cells < self.min_device_cells:
            from acc_genomics_tpu import native

            host = native.pairhmm_forward(testcases, np.float32)
            if host is not None:
                self.stats["host_native_calls"] = (
                    self.stats.get("host_native_calls", 0) + 1
                )
                self.stats["cells"] += total_cells
                return self._epilogue(testcases, host)

        # outliers beyond the largest bucket run on the host engine, like
        # the reference's per-segment AVX fallback (computePairhmmFalcon
        # `violate` -> computePairhmmAVXSegment, FalconPairHMM.cpp:609-611)
        fits = [
            k
            for k in range(n)
            if read_lens[k] <= self.config.max_read_len
            and hap_lens[k] <= self.config.max_hap_len
        ]
        over = [k for k in range(n) if k not in set(fits)] if len(fits) < n else []
        raw = np.zeros(n, np.float32)
        if over:
            self.stats["host_fallback"] = self.stats.get("host_fallback", 0) + len(over)
            raw[over] = self._host_forward([testcases[k] for k in over])

        plan = plan_buckets(
            [read_lens[k] for k in fits],
            [hap_lens[k] for k in fits],
            self.config.read_buckets,
            self.config.hap_buckets,
        )
        fits_arr = np.asarray(fits, dtype=np.int64)
        with Timer("pairhmm.device"):
            # launch every bucket before collecting any: packing bucket k+1
            # overlaps device compute of bucket k (async dispatch)
            pending = []
            for (rows, cols), idxs in plan.groups.items():
                max_pairs = self.config.max_batch_pairs
                for lo in range(0, len(idxs), max_pairs):
                    chunk = fits_arr[idxs[lo : lo + max_pairs]]
                    pack, res = self._launch_bucket(
                        [testcases[i] for i in chunk], rows, cols
                    )
                    pending.append((chunk, pack, res))
            # ONE D2H transfer for every bucket: device_get still pays a
            # round trip per leaf on the dev tunnel, so concatenate the
            # per-bucket results on device first
            if pending:
                allres = np.asarray(
                    jnp.concatenate([res for _, _, res in pending])
                )
                col = 0
                for chunk, pack, res in pending:
                    w = res.shape[0]
                    raw[chunk] = pack.unsort(allres[col : col + w])
                    col += w
        return self._epilogue(testcases, raw)

    def _host_forward(self, tcs) -> np.ndarray:
        """fp32 forward on the host CPU engine (native C++, oracle fallback)."""
        from acc_genomics_tpu import native

        res = native.pairhmm_forward(tcs, np.float32)
        if res is None:
            res = np.array(
                [
                    pairhmm_oracle(
                        t["rs"], t["q"], t["i"], t["d"], t["c"], t["hap"],
                        np.float32,
                    )
                    for t in tcs
                ],
                np.float32,
            )
        return res

    def _epilogue(self, testcases, raw: np.ndarray) -> np.ndarray:
        """log10 conversion + fp64 recompute of fp32 underflows (the
        AVX-double recompute contract, FalconPairHMM.cpp:634-656)."""
        n = len(testcases)
        out = np.empty(n, np.float64)
        ok = raw >= np.float32(self.config.min_accepted)
        with np.errstate(divide="ignore"):
            out[ok] = np.log10(raw[ok].astype(np.float64)) - np.float64(
                self.ctx32.log10_initial_constant
            )
        bad = np.flatnonzero(~ok)
        self.stats["recomputed"] += len(bad)
        if len(bad):
            from acc_genomics_tpu import native

            ctx64 = PairHMMContext(np.float64)
            with Timer("pairhmm.recompute64"):
                tc_bad = [testcases[i] for i in bad]
                r64 = native.pairhmm_forward(tc_bad, np.float64)
                if r64 is None:  # no toolchain: NumPy oracle fallback
                    r64 = np.array(
                        [
                            pairhmm_oracle(
                                t["rs"], t["q"], t["i"], t["d"], t["c"],
                                t["hap"], np.float64,
                            )
                            for t in tc_bad
                        ]
                    )
                out[bad] = np.log10(r64) - np.float64(
                    ctx64.log10_initial_constant
                )
        return out

    def compute_matrix(self, reads: Sequence[dict], haps: Sequence[np.ndarray]) -> np.ndarray:
        """All read x hap likelihoods, read-major (the reference driver's
        pairhmmInput -> likelihoodData layout, pairhmm/host/main.cpp)."""
        tcs = [
            dict(hap=h, **r)
            for r in reads
            for h in haps
        ]
        return self.compute_pairs(tcs).reshape(len(reads), len(haps))
