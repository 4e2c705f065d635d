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

import dataclasses
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


@dataclasses.dataclass
class DispatchCostModel:
    """Calibrated host-vs-device dispatch gate — the worthFPGA analog
    (/root/reference/pairhmm/xlnx/host/FalconPairHMM.cpp:112-139, which
    compares measured AVX time against PCIe + prep + compute + recompute
    with live constants).  Predicted times:

        host_s(cells)          = cells / (host_gcups * cores)
        device_s(cells, bytes) = fixed_s + cells / device_gcups
                                         + bytes / link_gb_s

    The constants are exactly what benchmarks/pairhmm_e2e_bench.py
    measures (pack/host rate, chained device rate, sustained link rate);
    :meth:`from_e2e_bench` ingests its result dict, :meth:`calibrate`
    micro-measures host + link in ~100 ms.  Defaults are conservative
    dev-tunnel figures (PERF_NOTES round 3) — on a PCIe host, calibrate:
    fixed_s drops ~50x and the crossover falls from ~20M to ~0.5M cells.
    """

    host_gcups: float = 0.35   # native 1-core forward rate
    device_gcups: float = 55.0  # chained-kernel rate (bench_pairhmm)
    link_gb_s: float = 0.05    # sustained H2D (dev tunnel; PCIe ~12)
    fixed_s: float = 0.06      # dispatch + sync RTTs per engine call
    cores: int = 1

    def host_s(self, cells: int) -> float:
        return cells / (self.host_gcups * max(self.cores, 1)) / 1e9

    def device_s(self, cells: int, nbytes: int) -> float:
        return (
            self.fixed_s
            + cells / self.device_gcups / 1e9
            + nbytes / (self.link_gb_s * 1e9)
        )

    def device_worthwhile(self, cells: int, nbytes: int) -> bool:
        return self.device_s(cells, nbytes) < self.host_s(cells)

    @classmethod
    def from_e2e_bench(cls, res: dict, cores: Optional[int] = None) -> "DispatchCostModel":
        """Build from benchmarks/pairhmm_e2e_bench.run()'s result dict."""
        import os

        cells = res["cells"] / max(res.get("n_batches", 8), 1)
        link_gcups = res["link_gcups"]
        # link_gcups = cells/batch per link-second at ~44 cells/byte
        link_gb_s = link_gcups * 1e9 / 44 / 1e9
        return cls(
            host_gcups=max(res.get("host_gcups", 0.35), 1e-3),
            device_gcups=res["device_gcups"],
            link_gb_s=max(link_gb_s, 1e-4),
            fixed_s=max(res.get("single_batch_latency_s", 0.06)
                        - cells / res["device_gcups"] / 1e9, 1e-3),
            cores=cores or os.cpu_count() or 1,
        )

    def calibrate(self, device=None) -> "DispatchCostModel":
        """Micro-measure host rate and link rate on THIS host (one ~64
        pair native run + one device_put); device_gcups stays as set."""
        import time

        from acc_genomics_tpu import native
        from acc_genomics_tpu.io.synth import gen_pairhmm_pairs

        rng = np.random.default_rng(0)
        tcs = gen_pairhmm_pairs(rng, 64, max_read_len=120, max_hap_len=300)
        cells = sum(len(t["rs"]) * len(t["hap"]) for t in tcs)
        host = self.host_gcups
        if native.pairhmm_forward(tcs, np.float32) is not None:  # warm
            t0 = time.perf_counter()
            native.pairhmm_forward(tcs, np.float32)
            host = cells / (time.perf_counter() - t0) / 1e9
        buf = np.zeros(4 << 20, np.uint8)
        dev = device or jax.devices()[0]
        jax.device_put(buf, dev).block_until_ready()
        t0 = time.perf_counter()
        jax.device_put(buf, dev).block_until_ready()
        dt = time.perf_counter() - t0
        import os

        return dataclasses.replace(
            self, host_gcups=host, link_gb_s=max(buf.size / dt / 1e9, 1e-4),
            cores=os.cpu_count() or 1,
        )


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
        # dispatch gate (worthFPGA analog).  Two tiers: the static cell
        # threshold (always on, zero-cost), and — when a calibrated
        # DispatchCostModel is installed via set_cost_model()/
        # calibrate_dispatch() — the full predicted-time comparison with
        # live constants, matching FalconPairHMM.cpp:112-139.
        self.min_device_cells = 2_000_000
        self.cost_model: Optional[DispatchCostModel] = None
        self.stats = {"pairs": 0, "recomputed": 0, "cells": 0, "device_calls": 0}
        # device-resident lookup tables for the byte-plane upload path
        # (uploaded once; coefficient planes are computed on device)
        self._tables = None
        # tests set this to run the Pallas path in interpret mode on CPU
        self._interpret = False

    # -- dispatch calibration ---------------------------------------------

    def set_cost_model(self, model: Optional[DispatchCostModel]):
        """Install (or clear) the calibrated dispatch gate."""
        self.cost_model = model

    def calibrate_dispatch(self, device_gcups: Optional[float] = None):
        """Micro-measure host + link constants on this host and install
        the calibrated gate (DispatchCostModel.calibrate); ~100 ms."""
        base = DispatchCostModel(
            device_gcups=device_gcups or DispatchCostModel.device_gcups
        )
        self.cost_model = base.calibrate(self.device)
        return self.cost_model

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
                    self.mesh, *args, block_diags=bd,
                    interpret=self._interpret,
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
        # C++ host engine (the reference's AVX-path role).  With a
        # calibrated cost model the gate compares PREDICTED times
        # (host cells/rate vs fixed + compute + upload) — see
        # DispatchCostModel; otherwise the static cell threshold applies.
        total_cells = sum(r * h for r, h in zip(read_lens, hap_lens))
        if self.cost_model is not None:
            # quals upload ships 5 byte planes per read + 1 per hap
            est_bytes = 5 * sum(read_lens) + sum(hap_lens) + 12 * n
            use_host = not self.cost_model.device_worthwhile(
                total_cells, est_bytes
            )
        else:
            use_host = total_cells < self.min_device_cells
        if use_host:
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
        # `violate` -> computePairhmmAVXSegment, FalconPairHMM.cpp:609-611).
        # On a mesh with a seq axis, pairs whose HAPLOTYPE (not read)
        # exceeds the bucket cap route to the DP x SP shard instead — the
        # collective-based replacement for the reference's host-side
        # segmentation of oversized haps (PairHMMFpga.cpp:284-332).
        seq_size = int(self.mesh.shape["seq"]) if self.mesh is not None else 1
        sp_cap = self.config.max_hap_len * seq_size
        fits, sp_idx, over = [], [], []
        for k in range(n):
            if (
                read_lens[k] <= self.config.max_read_len
                and hap_lens[k] <= self.config.max_hap_len
            ):
                fits.append(k)
            elif (
                seq_size > 1
                and read_lens[k] <= self.config.max_read_len
                and hap_lens[k] <= sp_cap
            ):
                sp_idx.append(k)
            else:
                over.append(k)
        raw = np.zeros(n, np.float32)
        host_thread = None
        if over:
            # host fallback on a worker thread, concurrent with the device
            # bucket launches below (the reference worker's CPU-region
            # boost::thread, PairHMMWorker.cpp:201-270; the native forward
            # releases the GIL)
            import threading

            self.stats["host_fallback"] = self.stats.get("host_fallback", 0) + len(over)

            def host_work():
                try:
                    raw[over] = self._host_forward(
                        [testcases[k] for k in over]
                    )
                except BaseException as e:  # re-raised after join
                    host_err.append(e)

            host_err = []
            host_thread = threading.Thread(target=host_work)
            host_thread.start()

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
            if sp_idx:
                # DP x SP: hap columns shard over "seq" (must divide by
                # seq_size); pack to the next seq-aligned column count
                from acc_genomics_tpu.parallel.sharded import (
                    pairhmm_forward_dpsp,
                    pairhmm_forward_dpsp_pallas,
                )

                self.stats["sp_pairs"] = (
                    self.stats.get("sp_pairs", 0) + len(sp_idx)
                )
                max_hl = max(hap_lens[k] for k in sp_idx)
                cols_sp = -(-max_hl // (seq_size * 128)) * seq_size * 128
                rows_sp = self.config.read_buckets[-1]
                sp_pack = pack_pairhmm_batch(
                    [testcases[k] for k in sp_idx],
                    rows=rows_sp, cols=cols_sp, dtype=np.float32,
                    lane_multiple=self._data_size,
                )
                sp_args = [jnp.asarray(v) for v in sp_pack.arrays()]
                if self.use_pallas:
                    # Pallas band-kernel pipeline: 3x the scan body on
                    # chip, within 1.2x of the DP Pallas kernel at long-hap
                    # shapes (PERF_NOTES "DP x SP Pallas band pipeline")
                    res = pairhmm_forward_dpsp_pallas(
                        self.mesh, *sp_args, interpret=self._interpret
                    )
                else:
                    res = pairhmm_forward_dpsp(self.mesh, *sp_args)
                pending.append((np.asarray(sp_idx, np.int64), sp_pack, res))
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
        if host_thread is not None:
            host_thread.join()
            if host_err:
                raise host_err[0]
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

    # -- flat ingestion path ---------------------------------------------

    def compute_pairs_flat(
        self,
        rs: np.ndarray, q: np.ndarray, i: np.ndarray, d: np.ndarray,
        c: np.ndarray, lens: np.ndarray,
        hap: np.ndarray, hlens: np.ndarray,
        offs: Optional[np.ndarray] = None,
        hoffs: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """log10-likelihoods from concatenated (wire-format) inputs."""
        return self._flat_finalize(
            *self._flat_launch(rs, q, i, d, c, lens, hap, hlens, offs, hoffs)
        )

    def _flat_launch(
        self, rs, q, i, d, c, lens, hap, hlens, offs=None, hoffs=None
    ):
        """Pack + enqueue all buckets of one flat batch WITHOUT fetching;
        the returned state finalizes via _flat_finalize.  See
        compute_pairs_flat for semantics.

        The zero-Python-per-pair path: rs/q/i/d/c are the per-read byte
        streams concatenated in pair order (lens gives each pair's read
        length), hap likewise (hlens).  This is the reference's own shape
        — its host interface ships exactly these concatenated buffers
        (pairhmm/interface/PairHMMHostInterface.cpp:175-255) and packs
        them in C++ (pack_fpga_input).  Bucketing, sorting, packing, and
        the fp64 recompute all run on flat arrays; per-pair Python loops
        never run.  Requires the native library (falls back to the dict
        path if unavailable).
        """
        from acc_genomics_tpu import native
        from acc_genomics_tpu.utils.convert import HAP_PAD
        from acc_genomics_tpu.ops.pairhmm.kernel import LANES

        lens = np.asarray(lens, np.int32)
        hlens = np.asarray(hlens, np.int32)
        n = len(lens)
        if n == 0:
            return ("done", np.zeros(0, np.float64)), None
        if offs is None:
            offs = np.zeros(n, np.int64)
            if n > 1:
                np.cumsum(lens[:-1].astype(np.int64), out=offs[1:])
        else:
            offs = np.ascontiguousarray(offs, np.int64)
        if hoffs is None:
            hoffs = np.zeros(n, np.int64)
            if n > 1:
                np.cumsum(hlens[:-1].astype(np.int64), out=hoffs[1:])
        else:
            hoffs = np.ascontiguousarray(hoffs, np.int64)
        if not (self.use_pallas and self.mesh is None) or not native.available():
            # fall back to the dict path (portable backends)
            tcs = [
                dict(
                    rs=rs[offs[k] : offs[k] + lens[k]],
                    q=q[offs[k] : offs[k] + lens[k]],
                    i=i[offs[k] : offs[k] + lens[k]],
                    d=d[offs[k] : offs[k] + lens[k]],
                    c=c[offs[k] : offs[k] + lens[k]],
                    hap=hap[hoffs[k] : hoffs[k] + hlens[k]],
                )
                for k in range(n)
            ]
            return ("done", self.compute_pairs(tcs)), None

        self.stats["pairs"] += n
        rs = np.ascontiguousarray(rs, np.uint8)
        q = np.ascontiguousarray(q, np.uint8)
        i = np.ascontiguousarray(i, np.uint8)
        d = np.ascontiguousarray(d, np.uint8)
        c = np.ascontiguousarray(c, np.uint8)
        hap = np.ascontiguousarray(hap, np.uint8)
        self.stats["cells"] += int((lens.astype(np.int64) * hlens).sum())

        rbuckets = np.asarray(self.config.read_buckets, np.int32)
        cbuckets = np.asarray(self.config.hap_buckets, np.int32)
        # bucket of each pair (vectorized); oversize -> -1
        rb = np.searchsorted(rbuckets - 1, lens, side="left")
        cb = np.searchsorted(cbuckets, hlens, side="left")
        over = (rb >= len(rbuckets)) | (cb >= len(cbuckets))
        rb = np.where(over, -1, rb)

        raw = np.zeros(n, np.float32)
        host_thread = None
        over_idx = np.flatnonzero(over)
        if len(over_idx):
            import threading

            self.stats["host_fallback"] = (
                self.stats.get("host_fallback", 0) + len(over_idx)
            )

            def host_work():
              try:
                out = np.empty(len(over_idx), np.float32)
                lib = native.get_lib()
                lib.pairhmm_forward_batch_f32(
                    rs, q, i, d, c,
                    np.ascontiguousarray(offs[over_idx]),
                    np.ascontiguousarray(lens[over_idx]),
                    hap, np.ascontiguousarray(hoffs[over_idx]),
                    np.ascontiguousarray(hlens[over_idx]), len(over_idx),
                    np.ascontiguousarray(self.ctx32.ph2pr, np.float32),
                    np.ascontiguousarray(
                        self.ctx32.match_to_match, np.float32
                    ),
                    np.float32(self.ctx32.initial_constant), out,
                )
                raw[over_idx] = out
              except BaseException as e:  # re-raised after join
                host_err.append(e)

            host_err = []
            host_thread = threading.Thread(target=host_work)
            host_thread.start()

        code = rb * (len(cbuckets) + 1) + cb  # group id per pair
        with Timer("pairhmm.device"):
            pending = []
            stage_q = []  # quals-mode groups: packed on host, uploaded ONCE
            for g in np.unique(code[~over]) if (~over).any() else []:
                idxs = np.flatnonzero(code == g)
                gr, gc = divmod(int(g), len(cbuckets) + 1)
                rows = int(rbuckets[gr])
                cols = int(cbuckets[gc])
                max_pairs = self.config.max_batch_pairs
                for lo in range(0, len(idxs), max_pairs):
                    sel = idxs[lo : lo + max_pairs]
                    # haplen-sorted lanes keep per-block trip counts tight
                    sel = sel[np.argsort(-hlens[sel], kind="stable")]
                    # power-of-two lane ladder: batch-to-batch bucket-mix
                    # jitter must not mint fresh jit shapes (pad lanes are
                    # inert: len 0, per-block trip counts stay minimal)
                    bp = LANES
                    while bp < len(sel):
                        bp *= 2
                    g_lens = np.zeros(bp, np.int32)
                    g_hlens = np.zeros(bp, np.int32)
                    g_offs = np.zeros(bp, np.int64)
                    g_hoffs = np.zeros(bp, np.int64)
                    g_lens[: len(sel)] = lens[sel]
                    g_hlens[: len(sel)] = hlens[sel]
                    g_offs[: len(sel)] = offs[sel]
                    g_hoffs[: len(sel)] = hoffs[sel]
                    if getattr(self.config, "upload", "quals") == "f32":
                        res = self._launch_flat_f32(
                            rs, q, i, d, c, g_offs, g_lens,
                            hap, g_hoffs, g_hlens, rows, cols,
                        )
                        self.stats["device_calls"] += 1
                        pending.append((sel, res))
                    else:
                        packed = native.pairhmm_pack_quals_flat(
                            rs, q, i, d, c, g_offs, g_lens,
                            hap, g_hoffs, g_hlens, rows, cols, HAP_PAD,
                        )
                        big, meta = self._quals_pack_arrays(
                            packed, g_lens, g_hlens
                        )
                        stage_q.append((sel, big, meta, rows))
            if stage_q:
                # ONE uint8 + ONE int32 H2D for the whole batch: on the
                # dev tunnel every device_put pays a full round trip, so
                # per-bucket uploads made a 12-bucket batch pay ~24 RTTs
                # (~0.7 s) for ~11 MB of payload
                du8 = jnp.asarray(
                    np.concatenate([b.ravel() for _, b, _, _ in stage_q])
                )
                dmi = jnp.asarray(
                    np.concatenate([m.ravel() for _, _, m, _ in stage_q])
                )
                self.stats["h2d_bytes"] = (
                    self.stats.get("h2d_bytes", 0) + du8.size + 4 * dmi.size
                )
                o = mo = 0
                for sel, b, m, rows in stage_q:
                    bb = jax.lax.slice(du8, (o,), (o + b.size,)).reshape(b.shape)
                    mm = jax.lax.slice(dmi, (mo,), (mo + m.size,)).reshape(m.shape)
                    o += b.size
                    mo += m.size
                    res = self._launch_quals_dev(bb, mm, rows)
                    self.stats["device_calls"] += 1
                    pending.append((sel, res))
            # concatenate per-bucket results ON DEVICE now (async); the
            # single D2H happens in _flat_finalize
            allres_dev = (
                jnp.concatenate([r for _, r in pending]) if pending else None
            )
        state = (
            "pending", rs, q, i, d, c, offs, lens, hap, hoffs, hlens,
            raw, pending, allres_dev, host_thread,
            host_err if host_thread is not None else [],
        )
        return state, None

    def _flat_finalize(self, state, _):
        """Fetch + scatter + fp64 epilogue for a _flat_launch state."""
        if state[0] == "done":
            return state[1]
        (_, rs, q, i, d, c, offs, lens, hap, hoffs, hlens,
         raw, pending, allres_dev, host_thread, host_err) = state
        if allres_dev is not None:
            allres = np.asarray(allres_dev)
            self.stats["d2h_bytes"] = (
                self.stats.get("d2h_bytes", 0) + allres.nbytes
            )
            col = 0
            for sel, res in pending:
                w = res.shape[0]
                raw[sel] = allres[col : col + len(sel)]
                col += w
        if host_thread is not None:
            host_thread.join()
            if host_err:
                raise host_err[0]
        return self._epilogue_flat(
            rs, q, i, d, c, offs, lens, hap, hoffs, hlens, raw
        )

    def _launch_flat_f32(
        self, rs, q, i, d, c, g_offs, g_lens, hap, g_hoffs, g_hlens,
        rows, cols,
    ):
        """Enqueue one bucket via the native f32 coefficient pack: two
        contiguous buffers + one int32 side-band = three H2D transfers
        (each device_put pays a full round trip on the dev tunnel), and
        the kernel consumes coefficients directly (no device-side table
        work — measured ~4x the byte-plane path's program time)."""
        from acc_genomics_tpu import native
        from acc_genomics_tpu.ops.pairhmm.kernel import (
            LANES,
            pairhmm_forward_pallas_packed_f32,
        )

        big_f, big_i = native.pairhmm_pack_flat_f32(
            rs, q, i, d, c, g_offs, g_lens, hap, g_hoffs, g_hlens,
            rows, cols,
            self.ctx32.ph2pr, self.ctx32.match_to_match,
            self.ctx32.initial_constant,
        )
        bp = big_f.shape[1]
        nd = rows + g_hlens.reshape(-1, LANES).max(axis=1)
        bd = ((nd + 3) // 4 * 4).astype(np.int32)
        meta = np.zeros((1, bp), np.int32)
        meta[0, : len(bd)] = bd
        # this path ships three buffers itself (no shared staging), so it
        # must account its own H2D bytes or the stream anatomy reports a
        # zero-byte stream in f32 mode (advisor finding, round 4)
        self.stats["h2d_bytes"] = (
            self.stats.get("h2d_bytes", 0)
            + big_f.nbytes + big_i.nbytes + meta.nbytes
        )
        return pairhmm_forward_pallas_packed_f32(
            jnp.asarray(big_f), jnp.asarray(big_i), jnp.asarray(meta),
            rows=rows, interpret=self._interpret,
        )

    def _quals_pack_arrays(self, packed, g_lens, g_hlens):
        """Host half of a byte-plane bucket launch: the six uint8 planes
        as ONE contiguous (5*rows + rows + cols, bp) buffer plus the
        (3, bp) int32 side-band (lens / haplens / per-128-lane-block
        diagonal trip counts rounded to the kernel's 4-diagonal unroll)."""
        from acc_genomics_tpu.ops.pairhmm.kernel import LANES

        oq, oi, od, oc, ors, hap_ext = packed
        rows = ors.shape[0]
        bp = ors.shape[1]
        big = oq.base if oq.base is not None else None
        if big is None or big.shape != (5 * rows + hap_ext.shape[0], bp):
            big = np.concatenate([oq, oi, od, oc, ors, hap_ext])
        # ship only the first `cols` hap rows: hlens <= cols, so the last
        # `rows` rows of the (rows+cols, bp) hap_ext plane are pure pad —
        # _launch_quals_dev re-appends them on device (22% fewer H2D
        # bytes; the link is the e2e bound on thin hosts)
        cols = hap_ext.shape[0] - rows
        big = big[: 5 * rows + cols]
        nd = rows + g_hlens.reshape(-1, LANES).max(axis=1)
        bd = ((nd + 3) // 4 * 4).astype(np.int32)
        meta = np.zeros((3, bp), np.int32)
        meta[0] = g_lens
        meta[1] = g_hlens
        meta[2, : len(bd)] = bd
        return big, meta

    def _launch_quals_dev(self, big_dev, meta_dev, rows):
        """Device half: enqueue the kernel on already-uploaded (or
        device-sliced) big/meta arrays.  big_dev carries only `cols` hap
        rows (the trailing `rows` pad rows are appended here on device —
        see _quals_pack_arrays)."""
        from acc_genomics_tpu.ops.pairhmm.kernel import (
            pairhmm_forward_pallas_from_quals_packed,
        )
        from acc_genomics_tpu.utils.convert import HAP_PAD

        big_dev = jnp.concatenate(
            [
                big_dev,
                jnp.full((rows, big_dev.shape[1]), HAP_PAD, jnp.uint8),
            ]
        )
        expand = getattr(self.config, "quals_expand", "arith")
        if self._tables is None:
            if expand == "gather":
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
            else:
                # arith mode computes the coefficients in-kernel; tiny
                # placeholders keep the call signature uniform without
                # paying two device_put round trips on the tunnel
                z = jax.device_put(jnp.zeros((1,), jnp.float32), self.device)
                self._tables = (z, z)
        return pairhmm_forward_pallas_from_quals_packed(
            big_dev, meta_dev, *self._tables,
            rows=rows,
            initial_constant=float(self.ctx32.initial_constant),
            interpret=self._interpret,
            expand=expand,
        )

    def _epilogue_flat(
        self, rs, q, i, d, c, offs, lens, hap, hoffs, hlens, raw
    ) -> np.ndarray:
        """log10 + fp64 recompute on flat arrays (no per-pair dicts)."""
        from acc_genomics_tpu import native

        n = len(lens)
        out = np.empty(n, np.float64)
        ok = raw >= np.float32(self.config.min_accepted)
        with np.errstate(divide="ignore"):
            out[ok] = np.log10(raw[ok].astype(np.float64)) - np.float64(
                self.ctx32.log10_initial_constant
            )
        bad = np.flatnonzero(~ok)
        self.stats["recomputed"] += len(bad)
        if len(bad):
            ctx64 = PairHMMContext(np.float64)
            r64 = np.empty(len(bad), np.float64)
            with Timer("pairhmm.recompute64"):
                lib = native.get_lib()
                lib.pairhmm_forward_batch_f64(
                    rs, q, i, d, c,
                    np.ascontiguousarray(offs[bad]),
                    np.ascontiguousarray(lens[bad]),
                    hap, np.ascontiguousarray(hoffs[bad]),
                    np.ascontiguousarray(hlens[bad]), len(bad),
                    np.ascontiguousarray(ctx64.ph2pr, np.float64),
                    np.ascontiguousarray(ctx64.match_to_match, np.float64),
                    np.float64(ctx64.initial_constant), r64,
                )
                out[bad] = np.log10(r64) - np.float64(
                    ctx64.log10_initial_constant
                )
        return out

    def compute_pairs_flat_stream(self, batches) -> list:
        """Pipelined multi-batch flat computation: every batch's buckets
        are packed and LAUNCHED before any result is fetched, so host
        packing of batch k+1 overlaps device compute of batch k and the
        final D2H is one transfer per batch — the steady-state streaming
        form of the reference's double-buffered host pipeline
        (bwa-sw/intel/aocl KernelWorker).

        batches: iterable of (rs, q, i, d, c, lens, hap, hlens) tuples.
        Returns a list of per-batch log10-likelihood arrays.

        window bounds the in-flight batches: the dev-tunnel runtime
        degrades sharply once its async queue backs up (measured ~10x
        per-launch stalls past ~4 queued batches), and a depth-2 pipeline
        already overlaps pack(k+1) with device(k).
        """
        import time as _t

        states: list = []
        outs: list = []
        t_launch = t_final = 0.0
        for b in batches:
            t0 = _t.perf_counter()
            states.append(self._flat_launch(*b))
            t_launch += _t.perf_counter() - t0
            if len(states) > 1:  # depth-2 window: at most 2 in flight
                t0 = _t.perf_counter()
                outs.append(self._flat_finalize(*states.pop(0)))
                t_final += _t.perf_counter() - t0
        while states:
            t0 = _t.perf_counter()
            outs.append(self._flat_finalize(*states.pop(0)))
            t_final += _t.perf_counter() - t0
        # phase accounting for the streamed-e2e anatomy (where does the
        # wall go: host pack+enqueue vs fetch-side wait).  Cumulative,
        # like the byte counters; callers diff around a run.
        self.stats["stream_launch_s"] = (
            self.stats.get("stream_launch_s", 0.0) + t_launch
        )
        self.stats["stream_finalize_s"] = (
            self.stats.get("stream_finalize_s", 0.0) + t_final
        )
        return outs

    def compute_matrix_flat(
        self, rs, q, i, d, c, read_lens, hap, hap_lens
    ) -> np.ndarray:
        """All read x hap likelihoods from flat per-read / per-hap streams.

        The cross product shares the underlying byte streams — pair
        (r, h) is addressed by (read offset r, hap offset h), so no data
        is replicated on the host (the reference tiles the same way,
        PairHMMWorker.cpp:217-222).
        """
        read_lens = np.asarray(read_lens, np.int32)
        hap_lens = np.asarray(hap_lens, np.int32)
        n_r, n_h = len(read_lens), len(hap_lens)
        roffs = np.zeros(n_r, np.int64)
        hoffs0 = np.zeros(n_h, np.int64)
        if n_r > 1:
            np.cumsum(read_lens[:-1].astype(np.int64), out=roffs[1:])
        if n_h > 1:
            np.cumsum(hap_lens[:-1].astype(np.int64), out=hoffs0[1:])
        res = self.compute_pairs_flat(
            rs, q, i, d, c,
            np.repeat(read_lens, n_h), hap, np.tile(hap_lens, n_r),
            offs=np.repeat(roffs, n_h), hoffs=np.tile(hoffs0, n_r),
        )
        return res.reshape(n_r, n_h)

    def compute_matrix(self, reads: Sequence[dict], haps: Sequence[np.ndarray]) -> np.ndarray:
        """All read x hap likelihoods, read-major (the reference driver's
        pairhmmInput -> likelihoodData layout, pairhmm/host/main.cpp)."""
        tcs = [
            dict(hap=h, **r)
            for r in reads
            for h in haps
        ]
        return self.compute_pairs(tcs).reshape(len(reads), len(haps))
