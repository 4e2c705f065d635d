"""Typed configuration for the engine.

Replaces the reference's three config tiers (Makefile -D board geometry,
CMake cache flags, Blaze protobuf runtime conf — see SURVEY.md §5) with a
single set of dataclasses. Geometry here is *bucket shapes* (padded batch
tiles handed to jit) rather than PE counts: the TPU analog of the
reference's MAX_READ_LEN/MAX_HAP_LEN/MAX_RSDATA_NUM device caps
(pairhmm/xlnx/common/common.h:3-11).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class PairHMMConfig:
    """PairHMM bucket geometry and numeric contract.

    Mirrors the behavioural constants of the reference
    (pairhmm/xlnx/common/common.h, pairhmm/xlnx/host/host_type.h:21):
    read cap 192, hap cap 1024, fp32 underflow threshold 1e-28 with fp64
    recompute.  Bucket shapes are rounded to TPU-friendly tiles.
    """

    # Padded read-length buckets (rows).  Each includes >=1 absorbing row,
    # so a bucket of R accepts reads of length <= R - 1.
    read_buckets: Tuple[int, ...] = (32, 64, 96, 128, 192, 256)
    # Padded hap-length buckets (columns).
    hap_buckets: Tuple[int, ...] = (128, 256, 512, 1024)
    # Max pairs per packed device batch (reference: MAX_RSDATA_NUM x
    # MAX_HAPDATA_NUM tiling, 2048 x 128).
    max_batch_pairs: int = 16384
    # Below this fp32 result, recompute the pair in fp64 (MIN_ACCEPTED).
    min_accepted: float = 1e-28
    # Device-side coefficient expansion for the quals upload mode:
    # "arith" computes ph2pr/matchToMatch arithmetically (exp2 + the
    # telescoped Jacobian identity; <=27 ulp vs the tables, 5x faster
    # device program), "gather" looks them up bit-exactly.
    quals_expand: str = "arith"
    # Relative error tolerance for testing vs the fp64 oracle.
    rel_tol: float = 5e-3
    # Flat-path upload representation: "quals" ships uint8 byte planes
    # (~1/8 the bytes; coefficients computed on device — right for
    # bandwidth-constrained links like the dev tunnel), "f32" ships
    # precomputed coefficient planes (~4x faster device program — right
    # for PCIe-attached hosts).
    upload: str = "quals"

    @property
    def max_read_len(self) -> int:
        return self.read_buckets[-1] - 1

    @property
    def max_hap_len(self) -> int:
        return self.hap_buckets[-1]


@dataclasses.dataclass(frozen=True)
class SmemConfig:
    """SMEM engine geometry + runtime options (smem/common/common.h:6-44,
    mem_opt_t smem/host/host_types.h:9-47).  The algorithm fields convert
    to :class:`~acc_genomics_tpu.ops.smem.reference.SmemParams` via
    :meth:`params` and are threaded into the oracle and the device state
    machine as static arguments."""

    min_seed_len: int = 19
    max_intv_alloc: int = 256  # per-read output interval cap
    # max lanes per device call; bigger batches segment into chunks of
    # this size (the reference's BATCH_SIZE streaming loop).  Throughput
    # scales with lanes until ~64K: at 100 Mbp / 101 bp, 16K lanes =
    # 22.9K reads/s, 64K lanes = 55.4K, flat beyond (the batched probe
    # gather amortizes; measured round 3 on v5e)
    batch_size: int = 65536
    seq_length: int = 256  # per-read sequence slot (largest bucket)
    # per-read length buckets: the machine's curr/back interval buffers
    # are (bucket+1, B), so short reads in a tight bucket halve the
    # masked-buffer work per iteration
    read_buckets: Tuple[int, ...] = (64, 128, 256)
    # passes of mem_collect_intv (split_len/split_width/max_mem_intv)
    split_len: int = 28
    split_width: int = 10
    max_mem_intv: int = 20
    # device-machine cap on the curr/back break-interval chain buffers
    # (rows of the while-carry, the dominant HBM cost); chains that
    # outgrow it flag the lane for host rerun.  Sweep at B=64K/100 Mbp/
    # 101 bp: 24 -> 66.8K reads/s bust=0, 16 -> busts 3% and slower;
    # raise for long-read workloads (threaded through params()).
    curr_cap: int = 24
    # machine output-buffer rows carried through the while loop (see
    # SmemParams.mem_cap; typical interval counts are ~6 at 101 bp,
    # p99 == 6 measured at 100 Mbp)
    mem_cap: int = 24
    # multi-read lanes: workloads wider than batch_size give each lane
    # up to this many reads to process SEQUENTIALLY in one device call
    # (in-body switching).  The while-loop bound becomes the max over
    # lanes of the SUM of per-read step counts — sums concentrate
    # (~1/sqrt(Q) relative spread), killing the 54% DONE-wait the
    # one-shot batch pays to its slowest lane (PERF_NOTES round 4; the
    # TPU-shaped analog of smem/device/smem.cpp keeping MAX_TILE_SIZE
    # reads in flight per stage).  Supersedes the round-3 stream_refill
    # and unique_fast experiments (both pruned; negative results in
    # PERF_NOTES).
    max_reads_per_lane: int = 8

    def params(self):
        from acc_genomics_tpu.ops.smem.reference import SmemParams

        return SmemParams(
            min_seed_len=self.min_seed_len,
            split_len=self.split_len,
            split_width=self.split_width,
            max_mem_intv=self.max_mem_intv,
            max_intv_alloc=self.max_intv_alloc,
            curr_cap=self.curr_cap,
            mem_cap=self.mem_cap,
        )


@dataclasses.dataclass(frozen=True)
class SWConfig:
    """HTC Smith-Waterman scoring + geometry (htc-sw/host/common.h:13-56)."""

    w_match: int = 200
    w_mismatch: int = -150
    w_open: int = -260
    w_extend: int = -11
    max_seq_len: int = 1536
    # max pairs per device launch; bigger batches segment into chunks of
    # this size (the reference's 260-alt batch cap, htc-sw/host/common.h:14,
    # resized for the TPU where e2e throughput scales with batch to ~4K)
    max_batch: int = 4096
    # padded (row, col) buckets for the fill kernel
    seq_buckets: Tuple[int, ...] = (64, 128, 192, 256, 320, 384, 512, 768, 1024, 1536)

    def params(self):
        from acc_genomics_tpu.ops.sw.reference import SWParams

        return SWParams(
            w_match=self.w_match, w_mismatch=self.w_mismatch,
            w_open=self.w_open, w_extend=self.w_extend,
        )


@dataclasses.dataclass(frozen=True)
class ExtendConfig:
    """BWA-MEM seed-extension scoring (bwa-sw/sdaccel/smithwaterman.cpp:29-35)."""

    o_del: int = 6
    e_del: int = 1
    o_ins: int = 6
    e_ins: int = 1
    pen_clip: int = 5
    w: int = 100
    match: int = 1
    mismatch: int = -4
    ambig: int = -1
    max_qlen: int = 256
    max_tlen: int = 1024

    def params(self):
        from acc_genomics_tpu.ops.extend.reference import ExtendParams

        return ExtendParams(
            o_del=self.o_del, e_del=self.e_del,
            o_ins=self.o_ins, e_ins=self.e_ins,
            pen_clip=self.pen_clip, w=self.w,
            sc_match=self.match, sc_mismatch=self.mismatch,
            sc_ambig=self.ambig,
        )


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    pairhmm: PairHMMConfig = PairHMMConfig()
    smem: SmemConfig = SmemConfig()
    sw: SWConfig = SWConfig()
    extend: ExtendConfig = ExtendConfig()
    # device mesh axes: data parallel over batches, sequence parallel over
    # hap/target columns (see parallel/)
    mesh_shape: Tuple[int, int] = (1, 1)
    mesh_axes: Tuple[str, str] = ("data", "seq")


def engine_config_from_dict(raw: dict) -> "EngineConfig":
    """Runtime config mapping -> EngineConfig (the analog of the
    reference's Blaze protobuf conf mapping accelerators to kernel
    geometry params, pairhmm/xlnx.conf).  Keys mirror the dataclass
    fields; unknown keys raise, missing keys keep defaults."""
    raw = dict(raw)

    def build(cls, d):
        fields = {f.name: f for f in dataclasses.fields(cls)}
        kw = {}
        for k, v in d.items():
            if k not in fields:
                raise ValueError(f"unknown {cls.__name__} key: {k}")
            if isinstance(v, list):
                v = tuple(v)
            kw[k] = v
        return cls(**kw)

    sub = {}
    for name, cls in (
        ("pairhmm", PairHMMConfig), ("smem", SmemConfig),
        ("sw", SWConfig), ("extend", ExtendConfig),
    ):
        if name in raw:
            sub[name] = build(cls, raw.pop(name))
    for k in ("mesh_shape", "mesh_axes"):
        if k in raw:
            sub[k] = tuple(raw.pop(k))
    if raw:
        raise ValueError(f"unknown EngineConfig keys: {sorted(raw)}")
    return EngineConfig(**sub)


def engine_config_from_json(path: str) -> "EngineConfig":
    import json

    with open(path) as f:
        return engine_config_from_dict(json.load(f))
