"""Seed-extension engine: batched left/right extension with resolution.

The TPU analog of the reference's seed pipeline (bwa-sw/sdaccel/
smithwaterman.cpp read_proc/seed_proc): seeds are flattened into a batch,
all LEFT extensions run as one device call, then all RIGHT extensions
(whose h0 is the left result) as a second call — the dependent 2-step
loop of seed_proc becomes two dense batches instead of 20 seed PEs.
"""

from __future__ import annotations

import time as _time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from acc_genomics_tpu.config import ExtendConfig
from acc_genomics_tpu.ops.extend.jax_impl import sw_extend_batch
from acc_genomics_tpu.ops.extend.reference import sw_extend_oracle
from acc_genomics_tpu.utils.timer import Timer


_KEYS = ("score", "qle", "tle", "gtle", "gscore", "max_off", "w")


def _fill_tm(buf: np.ndarray, seqs) -> np.ndarray:
    """Bulk-fill a time-major (L, n) pad buffer from a list of 1-D code
    arrays via ONE fancy scatter; returns the (n,) length vector.

    Replaces the per-task Python fill loop, which at 4096 seeds/batch was
    the engine's dominant cost (~35 us/seed of pure Python; the round-4
    verdict's extend-engine 36x kernel-vs-e2e gap).  Negative-stride
    views (reversed queries) concatenate fine — no host copies beyond
    the one concat."""
    n = len(seqs)
    lens = np.fromiter((len(s) for s in seqs), np.int64, n)
    tot = int(lens.sum())
    if tot:
        cat = np.concatenate(seqs).astype(np.uint8, copy=False)
        cols = np.repeat(np.arange(n), lens)
        rows = np.arange(tot) - np.repeat(
            np.concatenate(([0], np.cumsum(lens)[:-1])), lens
        )
        buf[rows, cols] = cat
    return lens.astype(np.int32)


def _bucket_ladder(start: int, cap: int):
    """Power-of-two ladder from start up to (and including) cap."""
    out = []
    b = start
    while b < cap:
        out.append(b)
        b *= 2
    out.append(cap)
    return tuple(out)


class ExtendEngine:
    def __init__(
        self,
        config: ExtendConfig = ExtendConfig(),
        device: Optional[jax.Device] = None,
        mesh=None,
        use_pallas: Optional[bool] = None,
    ):
        self.config = config
        self.device = device or jax.devices()[0]
        self.mesh = mesh
        # the Pallas kernel is single-device; the mesh DP path wraps the
        # portable XLA impl in shard_map
        self.use_pallas = (
            (self.device.platform == "tpu" and mesh is None)
            if use_pallas is None
            else use_pallas
        )
        self._data_size = int(mesh.shape["data"]) if mesh is not None else 1
        # device bucket ladders bounded by the configured caps; tasks past
        # the caps fall back to the host oracle (FalconSW_FPGA.cpp:43-51
        # gate pattern) instead of raising
        self.q_buckets = _bucket_ladder(32, config.max_qlen)
        self.t_buckets = _bucket_ladder(64, config.max_tlen)
        self.params = config.params()
        self.stats = {"seeds": 0, "device_calls": 0, "host_fallback": 0}
        # per-phase anatomy (see SmemEngine.anatomy): prep = per-seed
        # task construction, pack = pad-buffer fill, launch = H2D +
        # dispatch, fetch = the one batched D2H
        self.anatomy = dict(
            prep_s=0.0, pack_s=0.0, launch_s=0.0, fetch_s=0.0,
            h2d_bytes=0, d2h_bytes=0,
        )

    def reset_anatomy(self):
        for k in self.anatomy:
            self.anatomy[k] = 0.0 if k.endswith("_s") else 0

    def _run(self, queries, targets, h0s) -> Dict[str, np.ndarray]:
        """One direction for a set of tasks, bucketed by padded shape.
        Oversize tasks (query/target beyond the configured caps) run on
        the host oracle concurrently with the device groups."""
        n = len(queries)
        out = {k: np.zeros(n, np.int64) for k in
               ("score", "qle", "tle", "gtle", "gscore", "max_off", "w")}
        groups = {}
        host_idx = []
        for k in range(n):
            ql = max(len(queries[k]), 1)
            tl = max(len(targets[k]), 1)
            if ql > self.q_buckets[-1] or tl > self.t_buckets[-1]:
                host_idx.append(k)
                continue
            bq = next(b for b in self.q_buckets if ql <= b)
            bt = next(b for b in self.t_buckets if tl <= b)
            groups.setdefault((bq, bt), []).append(k)
        # launch every group before fetching any result: device compute
        # overlaps host packing, and all D2H transfers batch into one
        # device_get (one round trip instead of one per (group, field))
        pending = []
        with Timer("extend.device"):
            for (bq, bt), idxs in groups.items():
                if self.use_pallas:
                    # tlen-sorted packing -> tight per-block trip counts
                    idxs = sorted(idxs, key=lambda k: -len(targets[k]))
                    bsz = 128
                else:
                    bsz = max(8, self._data_size)
                while bsz < len(idxs):  # x4 ladder: very few cached shapes
                    bsz *= 4
                if bsz % self._data_size:
                    bsz += self._data_size - bsz % self._data_size
                # uint8 on the wire (codes <= 4); device-side casts are free
                t0p = _time.perf_counter()
                q_tm = np.full((bq, bsz), 4, np.uint8)
                t_tm = np.full((bt, bsz), 4, np.uint8)
                qlen = np.zeros(bsz, np.int32)
                tlen = np.zeros(bsz, np.int32)
                h0 = np.zeros(bsz, np.int32)
                m = len(idxs)
                qlen[:m] = _fill_tm(q_tm[:, :m], [queries[k] for k in idxs])
                tlen[:m] = _fill_tm(t_tm[:, :m], [targets[k] for k in idxs])
                h0[:m] = np.fromiter((h0s[k] for k in idxs), np.int64, m)
                self.anatomy["pack_s"] += _time.perf_counter() - t0p
                self.anatomy["h2d_bytes"] += (
                    q_tm.nbytes + t_tm.nbytes + 3 * qlen.nbytes
                )
                self.stats["device_calls"] += 1
                t0l = _time.perf_counter()
                eargs = (
                    jnp.asarray(q_tm), jnp.asarray(t_tm),
                    jnp.asarray(qlen), jnp.asarray(tlen), jnp.asarray(h0),
                    jnp.asarray(qlen), jnp.asarray(qlen),
                )
                if self.mesh is not None:
                    from acc_genomics_tpu.parallel.sharded_kernels import (
                        sw_extend_dp,
                    )

                    res = sw_extend_dp(self.mesh, *eargs, params=self.params)
                elif self.use_pallas:
                    from acc_genomics_tpu.ops.extend.kernel import (
                        LANES,
                        sw_extend_pallas,
                    )

                    block_rows = np.maximum(
                        tlen.reshape(-1, LANES).max(axis=1), 1
                    ).astype(np.int32)
                    res = sw_extend_pallas(
                        *eargs, jnp.asarray(block_rows), params=self.params
                    )
                else:
                    res = sw_extend_batch(*eargs, params=self.params)
                packed = jnp.stack([res[k] for k in _KEYS])
                pending.append((idxs, packed))
                self.anatomy["launch_s"] += _time.perf_counter() - t0l
            # host fallback for oversize tasks on a worker thread, running
            # CONCURRENTLY with device compute + the D2H fetch below (the
            # hybrid CPU/device split of PairHMMWorker.cpp:201-270; the
            # native ksw_extend2 call releases the GIL)
            host_thread = None
            host_err = []
            if host_idx:
                from acc_genomics_tpu import native

                self.stats["host_fallback"] += len(host_idx)

                def host_work():
                    hres = native.sw_extend_host(
                        [queries[k] for k in host_idx],
                        [targets[k] for k in host_idx],
                        [int(h0s[k]) for k in host_idx],
                        self.params,
                    )
                    if hres is not None:
                        for j, k in enumerate(host_idx):
                            for key in _KEYS:
                                out[key][k] = hres[key][j]
                        return
                    for k in host_idx:
                        r = sw_extend_oracle(
                            queries[k], targets[k], int(h0s[k]),
                            max_ins=len(queries[k]), max_del=len(queries[k]),
                            params=self.params,
                        )
                        for key in _KEYS:
                            out[key][k] = r[key]

                import threading

                def host_work_guarded():
                    try:
                        host_work()
                    except BaseException as e:  # re-raised after join
                        host_err.append(e)

                host_thread = threading.Thread(target=host_work_guarded)
                host_thread.start()
            # ONE D2H transfer for every group: per-leaf fetches each pay
            # a ~25 ms round trip on the dev tunnel, so all (7, bsz_g)
            # group results concatenate on device first
            if pending:
                t0f = _time.perf_counter()
                allpacked = np.asarray(
                    jnp.concatenate([p for _, p in pending], axis=1)
                )
                self.anatomy["fetch_s"] += _time.perf_counter() - t0f
                self.anatomy["d2h_bytes"] += allpacked.nbytes
            if host_thread is not None:
                host_thread.join()
                if host_err:
                    raise host_err[0]
        col = 0
        for idxs, packed in pending:
            ia = np.asarray(idxs, np.int64)
            w = packed.shape[1]
            for r, key in enumerate(_KEYS):
                out[key][ia] = allpacked[r, col : col + len(idxs)]
            col += w
        return out

    def extend_seeds(self, seeds: Sequence[dict]) -> List[dict]:
        """Each seed: read, rseq, qbeg, rbeg_off, len -> resolved alignment
        record (qBeg/qEnd/rBeg/rEnd/score/trueScore/width), seed_proc
        semantics."""
        n = len(seeds)
        self.stats["seeds"] += n
        t0 = _time.perf_counter()
        left_q, left_t, right_q, right_t = [], [], [], []
        for s in seeds:
            read, rseq = s["read"], s["rseq"]
            qb, ro, sl = s["qbeg"], s["rbeg_off"], s["len"]
            # negative-stride VIEWS (no copies): _fill_tm's concat is the
            # only host copy on the whole pack path
            left_q.append(read[:qb][::-1])
            left_t.append(rseq[:ro][::-1])
            right_q.append(read[qb + sl :])
            right_t.append(rseq[ro + sl :])
        self.anatomy["prep_s"] += _time.perf_counter() - t0

        h0_left = [s["len"] for s in seeds]
        lres = self._run(left_q, left_t, h0_left)
        h0_right = lres["score"]
        rres = self._run(right_q, right_t, h0_right)

        # vectorized gscore-vs-clip resolution (seed_proc semantics,
        # bwa-sw/sdaccel/smithwaterman.cpp:636-659)
        qb = np.array([s["qbeg"] for s in seeds], np.int64)
        rq_len = np.array([len(q) for q in right_q], np.int64)
        lsc, rsc = lres["score"], rres["score"]
        pen_clip = self.params.pen_clip
        l_clip = (lres["gscore"] <= 0) | (lres["gscore"] <= lsc - pen_clip)
        q_beg = np.where(l_clip, qb - lres["qle"], 0)
        r_beg = np.where(l_clip, -lres["tle"], -lres["gtle"])
        true_l = np.where(l_clip, lsc, lres["gscore"])
        r_clip = (rres["gscore"] <= 0) | (rres["gscore"] <= rsc - pen_clip)
        q_end = np.where(r_clip, rres["qle"], rq_len)
        r_end = np.where(r_clip, rres["tle"], rres["gtle"])
        true_score = true_l + np.where(r_clip, rsc, rres["gscore"]) - lsc
        width = np.maximum(lres["w"], rres["w"])
        return [
            dict(
                qBeg=int(q_beg[k]), qEnd=int(q_end[k]), rBeg=int(r_beg[k]),
                rEnd=int(r_end[k]), score=int(rsc[k]),
                trueScore=int(true_score[k]), width=int(width[k]),
            )
            for k in range(n)
        ]
