"""SMEM engine: device-resident FM-index + batched collection.

The index is uploaded once and kept in HBM across calls — the TPU analog
of the reference writing the (replicated) BWT to every DRAM bank at init
(smem/host/ocl.cpp:169-293) and of BWAOCLEnv's one-time pac preload.
Reads whose interval count exceeds MAX_INTV_ALLOC are rerun on the host
oracle, matching the reference's overflow contract (smem/main.cpp:158-164).

The device path is the flat state machine of ops/smem/machine.py (one
batched 32-byte FM-index probe per iteration for every lane); the
literal while_loop translation in ops/smem/jax_impl.py is kept as a
secondary implementation for differential testing.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import numpy as np

from acc_genomics_tpu.config import SmemConfig
from acc_genomics_tpu.ops.smem.index import FMIndex
from acc_genomics_tpu.ops.smem.machine import (
    S_DONE,
    _segment_jit,
    device_index_fused,
    intervals_to_dicts,
    smem_batch_machine,
    smem_stream_extract,
    smem_stream_refill,
)
from acc_genomics_tpu.ops.smem.reference import mem_collect_intv_oracle
from acc_genomics_tpu.utils.timer import Timer


class SmemEngine:
    def __init__(
        self,
        fm: FMIndex,
        config: SmemConfig = SmemConfig(),
        device: Optional[jax.Device] = None,
        mesh=None,
    ):
        self.fm = fm
        self.config = config
        self.device = device or jax.devices()[0]
        self.mesh = mesh
        with Timer("smem.index_upload"):
            # unique_fast appends SA/ISA/text regions to the probe table
            # (the s==1 text-comparison fast path; exact either way)
            idx = device_index_fused(fm, unique_fast=config.unique_fast)
            if mesh is not None:
                # replicate the index on every mesh device (the analog of
                # the reference replicating the BWT per DRAM bank)
                from jax.sharding import NamedSharding, PartitionSpec as P

                rep = NamedSharding(mesh, P())
                self.idx = {k: jax.device_put(v, rep) for k, v in idx.items()}
            else:
                self.idx = {
                    k: (jax.device_put(v, self.device) if hasattr(v, "shape") else v)
                    for k, v in idx.items()
                }
        self.params = config.params()
        self.stats = {"reads": 0, "overflow_reruns": 0, "probe_iters": 0}

    def collect(self, reads: List[np.ndarray]) -> List[List[dict]]:
        """3-pass SMEM intervals per read."""
        self.stats["reads"] += len(reads)
        seq_len = self.config.seq_length
        buckets = tuple(
            b for b in getattr(self.config, "read_buckets", (seq_len,))
            if b <= seq_len
        ) or (seq_len,)
        out: List = [None] * len(reads)
        # route oversized reads straight to host; bucket the rest by
        # length (the machine's interval buffers are (bucket+1, B), so a
        # tight bucket halves the masked-buffer work for short reads)
        host_idx = [k for k, r in enumerate(reads) if len(r) > seq_len]
        groups = {}
        for k, r in enumerate(reads):
            if len(r) > seq_len:
                continue
            b = next(b for b in buckets if len(r) <= b)
            groups.setdefault(b, []).append(k)
        # host reruns run on a single worker thread CONCURRENTLY with the
        # device loop (the hybrid CPU||device split of the reference
        # worker, PairHMMWorker.cpp:201-270): oversized reads are known
        # before launch and dispatch immediately; overflow/bust lanes
        # dispatch as each device batch reports them, overlapping the
        # remaining batches.  The ctypes call releases the GIL.
        def host_work(idx_chunk):
            from acc_genomics_tpu import native

            host_reads = [reads[k] for k in idx_chunk]
            hres = native.smem_collect_host(self.fm, host_reads, self.params)
            for j, k in enumerate(idx_chunk):
                r = hres[j] if hres is not None else None
                if r is None:  # no native lib (or pathological read)
                    r = mem_collect_intv_oracle(self.fm, reads[k], self.params)
                out[k] = r

        import concurrent.futures

        pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        futures = []
        if host_idx:
            with Timer("smem.host_dispatch"):
                futures.append(pool.submit(host_work, list(host_idx)))
        # segment big groups into batch_size device calls (the reference's
        # BATCH_SIZE streaming loop, smem/main.cpp getBatch).  Groups
        # larger than one device batch instead run the STREAMING machine:
        # fixed-iteration segments with per-lane retirement + refill, so
        # throughput tracks the MEAN per-read step count instead of the
        # batch max (the DONE-wait tail was 54% of lane-steps).
        seg = max(int(self.config.batch_size), 1)
        try:
            for b, idxs in groups.items():
                if (
                    self.config.stream_refill
                    and self.mesh is None
                    and len(idxs) > seg
                ):
                    with Timer("smem.device_stream"):
                        rerun = self._collect_stream(reads, idxs, b, out)
                    if rerun:
                        self.stats["overflow_reruns"] += len(rerun)
                        futures.append(pool.submit(host_work, rerun))
                    continue
                for lo in range(0, len(idxs), seg):
                    dev_idx = idxs[lo : lo + seg]
                    with Timer("smem.device"):
                        res, overflow, iters = smem_batch_machine(
                            self.idx, [reads[k] for k in dev_idx], seq_len=b,
                            mesh=self.mesh, params=self.params,
                        )
                    self.stats["probe_iters"] += iters
                    rerun = []
                    for j, k in enumerate(dev_idx):
                        if overflow[j]:
                            rerun.append(k)
                            self.stats["overflow_reruns"] += 1
                        else:
                            out[k] = res[j]
                    if rerun:
                        futures.append(pool.submit(host_work, rerun))
            with Timer("smem.host_join"):
                for f in futures:
                    f.result()  # re-raise host errors
        finally:
            pool.shutdown(wait=True)
            # surface host-worker failures even when the device loop
            # raised first (the host error is often the root cause);
            # never mask the primary exception
            import sys

            for f in futures:
                if f.done() and not f.cancelled() and f.exception():
                    print(
                        f"smem host worker failed: {f.exception()!r}",
                        file=sys.stderr,
                    )
        return out

    def _collect_stream(self, reads, idxs, bucket, out):
        """Streaming collection of reads[idxs] (all <= bucket long).

        The unified machine (all three passes in one state body) runs in
        fixed-iteration segments; lanes whose read finished are retired
        in fixed quanta of R columns and refilled from the queue, so one
        device batch stays resident and throughput tracks the MEAN
        per-read step count instead of the batch max (DONE-wait was 54%
        of lane-steps in the one-shot machine).  This is the batch-scale
        analog of the reference keeping MAX_TILE_SIZE=16 reads in flight
        per stage (smem/device/smem.cpp:1962-1997).

        Results land in out[k]; returns read indices needing a host
        rerun (interval overflow / chain bust / step-budget cap).  Each
        harvest cycle costs one (B,) state fetch, one extract fetch, and
        one (L, R) upload on the tunnel.
        """
        import jax.numpy as jnp

        cfg = self.config
        B = max(int(cfg.batch_size), 8)
        L = bucket
        R = max(B // 8, 1)
        max_lane_steps = 64 * L + 4096
        queue = list(idxs)
        qpos = 0
        lane2read = np.full(B, -1, np.int64)
        seq_np = np.full((L, B), 4, np.uint8)
        lens_np = np.zeros(B, np.int32)
        for j, k in enumerate(queue[:B]):
            r = reads[k]
            seq_np[: len(r), j] = r
            lens_np[j] = len(r)
            lane2read[j] = k
        qpos = min(B, len(queue))
        seq_dev = jnp.asarray(seq_np)
        lens_dev = jnp.asarray(lens_np)
        state = None
        rerun = []
        MM = min(max(self.params.mem_cap, 8), self.params.max_intv_alloc)

        def plan_harvest(chunk):
            """Dispatch extract + refill for one fixed quantum of R
            columns; returns a deferred (extract handle, col->read map)
            processed AFTER the next segment launches, so the extract
            D2H and the dict conversion overlap device compute."""
            nonlocal state, seq_dev, lens_dev, qpos
            pad_pool = [j for j in range(B) if lane2read[j] < 0]
            cols = list(chunk) + pad_pool[: R - len(chunk)]
            # chunk + unassigned lanes always reach R (B >= 8R; a partial
            # final chunk means every other lane is already retired);
            # duplicate columns would hit undefined scatter order in the
            # refill, so fail loudly if the invariant ever breaks
            assert len(cols) >= R, (len(chunk), len(pad_pool), R)
            cols = cols[:R]
            first_slot = {}
            for j, lane in enumerate(cols):
                first_slot.setdefault(lane, j)
            col2read = [
                int(lane2read[lane]) if first_slot[lane] == j else -1
                for j, lane in enumerate(cols)
            ]
            cols_a = jnp.asarray(np.asarray(cols, np.int32))
            handle = smem_stream_extract(state, cols_a)  # async dispatch
            # refill from the queue; duplicate pad slots are inert len-0
            new_seq = np.full((L, R), 4, np.uint8)
            new_lens = np.zeros(R, np.int32)
            for j, lane in enumerate(cols):
                if first_slot[lane] != j:
                    continue
                lane2read[lane] = -1
                if qpos < len(queue):
                    k = queue[qpos]
                    qpos += 1
                    r = reads[k]
                    new_seq[: len(r), j] = r
                    new_lens[j] = len(r)
                    lane2read[lane] = k
            state, seq_dev, lens_dev = smem_stream_refill(
                state, seq_dev, lens_dev, cols_a,
                jnp.asarray(new_seq), jnp.asarray(new_lens),
            )
            return handle, col2read

        def finish_harvest(handle, col2read):
            got = np.asarray(handle)
            mem_ns = got[5 * MM]
            busts = got[5 * MM + 1]
            div = intervals_to_dicts(
                got[: 5 * MM].reshape(5, MM, R), np.minimum(mem_ns, MM), R
            )
            for j, k in enumerate(col2read):
                if k < 0:
                    continue
                if busts[j] or mem_ns[j] > MM:
                    rerun.append(k)
                else:
                    out[k] = div[j]

        inflight = False
        while not (qpos >= len(queue) and (lane2read < 0).all()):
            pending = []
            if not inflight:
                state = _segment_jit(
                    self.idx, seq_dev, lens_dev,
                    max_iters=max_lane_steps, params=self.params,
                    seg_state=state, seg_iters=int(cfg.stream_seg_iters),
                )
            inflight = False
            st_host = np.asarray(state["st"])
            done = [
                j for j in range(B)
                if st_host[j] == S_DONE and lane2read[j] >= 0
            ]
            drained = qpos >= len(queue)
            live_left = any(
                lane2read[j] >= 0 and st_host[j] != S_DONE for j in range(B)
            )
            lo = 0
            while lo + R <= len(done):
                pending.append(plan_harvest(done[lo : lo + R]))
                lo += R
            if drained and not live_left and lo < len(done):
                pending.append(plan_harvest(done[lo:]))
            if pending and not (qpos >= len(queue) and (lane2read < 0).all()):
                # launch the next segment BEFORE fetching extract outputs:
                # the D2H + dict conversion then overlap device compute
                state = _segment_jit(
                    self.idx, seq_dev, lens_dev,
                    max_iters=max_lane_steps, params=self.params,
                    seg_state=state, seg_iters=int(cfg.stream_seg_iters),
                )
                inflight = True
            for handle, col2read in pending:
                finish_harvest(handle, col2read)
        if state is not None:
            self.stats["probe_iters"] += int(np.asarray(state["iters"]))
        return rerun

    def collect_arrays(self, seq_tm: np.ndarray, lens: np.ndarray):
        """Raw-array SMEM collection for device pipelines (no per-interval
        dict conversion): seq_tm (L, B) uint8 codes, lens (B,).

        Returns (mem (5, used, B) int32 [x0,x1,s,start,end], mem_n (B,),
        overflow (B,) bool).  Overflow/bust lanes carry no intervals here;
        callers route those reads through the host path.

        Batches wider than config.batch_size are segmented into
        batch_size device calls (one jit-cache shape, bounded HBM) and
        the results re-concatenated.
        """
        import jax.numpy as jnp

        from acc_genomics_tpu.ops.smem.machine import _collect_jit

        B = seq_tm.shape[1]
        seg = max(int(self.config.batch_size), 1)
        if B > seg:
            parts = [
                self.collect_arrays(seq_tm[:, lo : lo + seg],
                                    lens[lo : lo + seg])
                for lo in range(0, B, seg)
            ]
            used = max(p[0].shape[1] for p in parts)

            def padu(m):
                pad = used - m.shape[1]
                if pad:
                    m = np.concatenate(
                        [m, np.zeros((5, pad, m.shape[2]), m.dtype)], axis=1
                    )
                return m

            return (
                np.concatenate([padu(p[0]) for p in parts], axis=2),
                np.concatenate([p[1] for p in parts]),
                np.concatenate([p[2] for p in parts]),
            )

        with Timer("smem.device"):
            mem, mem_n, iters = _collect_jit(
                self.idx, jnp.asarray(seq_tm), jnp.asarray(lens),
                params=self.params,
            )
            mem_n, iters = jax.device_get((mem_n, jnp.asarray(iters)))
            self.stats["probe_iters"] += int(iters)
            self.stats["reads"] += seq_tm.shape[1]
            cap = self.params.max_intv_alloc
            used = int(min(cap, mem_n.max(initial=0)))
            memc = np.asarray(
                jnp.stack([m[:used].astype(jnp.int32) for m in mem])
            )
        overflow = mem_n > cap
        self.stats["overflow_reruns"] += int(overflow.sum())
        return memc, np.minimum(mem_n, cap) * ~overflow, overflow
