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
    device_index_fused,
    smem_batch_machine,
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
        # BATCH_SIZE streaming loop, smem/main.cpp getBatch)
        seg = max(int(self.config.batch_size), 1)
        try:
            for b, idxs in groups.items():
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
        return out

    def collect_arrays(self, seq_tm: np.ndarray, lens: np.ndarray):
        """Raw-array SMEM collection for device pipelines (no per-interval
        dict conversion): seq_tm (L, B) uint8 codes, lens (B,).

        Returns (mem (5, used, B) int32 [x0,x1,s,start,end], mem_n (B,),
        overflow (B,) bool).  Overflow/bust lanes carry no intervals here;
        callers route those reads through the host path.
        """
        import jax.numpy as jnp

        from acc_genomics_tpu.ops.smem.machine import _collect_jit

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
