"""Headline benchmark: all four kernels on one chip, ONE JSON line.

The headline metric stays PairHMM effective GCUPS vs the reference's
published 15 GCUPS FPGA average (pairhmm/xlnx/README.md, BASELINE.md
row 1); the "extras" field carries the other three kernels so every
BENCH_r*.json tracks SW / SMEM / extend round-over-round too:

  sw_e2e_gcups       — engine end-to-end (fill + device walk + transfers
                       + decode) vs the reference's 0.3 GCUPS e2e
                       (htc-sw/README.md:27)
  smem_reads_per_s   — driver-style engine e2e at 101 bp (plus the
                       analytical probe-traffic GB/s, the reference's
                       per-bank DRAM accounting, smem/main.cpp:352-366)
  extend_seeds_per_s — Pallas banded kernel (chained-jit timing)

Timing note: on the axon dev tunnel, block_until_ready() returns early
and D2H readback carries a ~25ms HTTP round trip.  Kernel numbers chain
K dependent jit calls and divide; engine e2e numbers take min-of-K calls
(the tunnel/host contention swings individual reps 2x).
"""

import json
import time

import numpy as np


def _timed(fn):
    t0 = time.time()
    _ = np.asarray(fn())
    return time.time() - t0


def bench_pairhmm(on_tpu):
    """Effective GCUPS over real (unpadded) cells, engine-style dispatch:
    read-length buckets, haplen-sorted packing, per-block trip counts."""
    import jax
    import jax.numpy as jnp

    from acc_genomics_tpu.io.synth import gen_pairhmm_pairs
    from acc_genomics_tpu.ops.pairhmm.pack import pack_pairhmm_batch
    from acc_genomics_tpu.ops.pairhmm.jax_impl import pairhmm_forward
    from acc_genomics_tpu.ops.pairhmm.kernel import (
        block_diag_counts,
        pairhmm_forward_pallas,
    )

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    n_pairs = 8192 if on_tpu else 512
    rows_max, cols = 152, 384
    row_buckets = (64, 96, 128, rows_max)
    tcs = gen_pairhmm_pairs(rng, n_pairs, max_read_len=rows_max - 2, max_hap_len=cols)

    groups = {b: [] for b in row_buckets}
    for t in tcs:
        for b in row_buckets:
            if len(t["rs"]) < b:
                groups[b].append(t)
                break

    packs = []
    for rows, group in groups.items():
        if not group:
            continue
        packs.append(
            pack_pairhmm_batch(
                group, rows=rows, cols=cols, dtype=np.float32, sort_by_haplen=True
            )
        )
    bucket_args = [
        (
            [jax.device_put(jnp.asarray(v), dev) for v in p.arrays()],
            jax.device_put(jnp.asarray(block_diag_counts(p)), dev),
        )
        for p in packs
    ]
    cells = sum(p.cells for p in packs)

    fwd = (
        (lambda a, bd: pairhmm_forward_pallas(*a, block_diags=bd))
        if on_tpu
        else (lambda a, bd: pairhmm_forward(*a))
    )

    K = 16 if on_tpu else 2

    @jax.jit
    def chain():
        bump = jnp.float32(0.0)
        for _ in range(K):
            for a, bd in bucket_args:
                a = list(a)
                a[0] = a[0] + bump
                out = fwd(a, bd)
                bump = out[:1].sum() * 0.0
        return out

    np.asarray(chain())  # compile
    t = min(_timed(chain) for _ in range(3))
    return cells / (t / K) / 1e9


def bench_sw(on_tpu):
    """SW engine end-to-end GCUPS (device fill + walk + transfers + decode)."""
    from acc_genomics_tpu.engine.sw_engine import SWEngine
    from acc_genomics_tpu.io.synth import gen_sw_batch

    rng = np.random.default_rng(0)
    batch = 8192 if on_tpu else 64  # e2e scales with batch (4K: ~1.8-2.3,
    # 8K: ~2.3-2.6 GCUPS; 16K flat — round-3 sweep)
    K = 4 if on_tpu else 2
    eng = SWEngine()
    ref, alts = gen_sw_batch(rng, batch, ref_len=286)
    refs = [ref] * len(alts)
    eng.align(refs, alts, 0)  # warm the jit cache
    dts = [
        _timed(lambda: np.float32(0) if eng.align(refs, alts, 0) else 0)
        for _ in range(K)
    ]
    cells = sum(len(ref) * len(a) for a in alts)
    # per-rep times in the artifact: tunnel mood vs regression is
    # decidable from the spread (round-4 verdict weak #6)
    return dict(
        gcups=cells / min(dts) / 1e9,
        rep_ms=[round(d * 1e3, 1) for d in dts],
    )


def _smem_device_rate(eng, seq_tm, lens, K=3):
    """Chip-only machine rate on RESIDENT inputs with one tiny fetch per
    rep — the companion number that separates machine regressions from
    tunnel mood in the e2e series (round-4 verdict item 3)."""
    import jax
    import jax.numpy as jnp

    from acc_genomics_tpu.ops.smem.machine import _collect_jit

    seq_d, lens_d = jnp.asarray(seq_tm), jnp.asarray(lens)

    def dev_run():
        mem, mem_n, iters = _collect_jit(
            eng.idx, seq_d, lens_d, params=eng.params
        )
        return jax.device_get((mem_n[:4], jnp.asarray(iters)))

    _, iters = dev_run()  # warm (compile shared with the e2e path)
    dts = []
    for _ in range(K):
        t0 = time.perf_counter()
        dev_run()
        dts.append(time.perf_counter() - t0)
    return lens.shape[0] / min(dts), int(iters)


def _anatomy_extras(anatomy, prefix, reps):
    """Per-phase engine anatomy -> BENCH extras (seconds per rep + MB +
    achieved link MB/s), so the artifact itself reconciles every e2e
    number against its phases (round-4 verdict item 2)."""
    out = {}
    for k, v in anatomy.items():
        if k.endswith("_s"):
            out[f"{prefix}_{k[:-2]}_ms"] = round(v / reps * 1e3, 1)
        else:
            out[f"{prefix}_{k[:-6]}_mb"] = round(v / reps / 1e6, 2)
    up_s = anatomy.get("launch_s", 0.0)
    if anatomy.get("h2d_bytes", 0) and up_s > 0:
        out[f"{prefix}_h2d_mb_s"] = round(
            anatomy["h2d_bytes"] / up_s / 1e6, 1
        )
    fe_s = anatomy.get("fetch_s", 0.0)
    if anatomy.get("d2h_bytes", 0) and fe_s > 0:
        out[f"{prefix}_d2h_mb_s"] = round(
            anatomy["d2h_bytes"] / fe_s / 1e6, 1
        )
    return out


def bench_smem(on_tpu, n_reads=None):
    """SMEM engine e2e reads/s at 101 bp + analytical probe GB/s.

    FROZEN shapes (round-4 rule: bench shapes never change silently):
    the headline runs at 65536 lanes (the r03 shape) and main() also
    emits the 16384-lane figure (the r02 shape) so the cross-round
    series stays comparable.  Returns a dict carrying, per the round-4
    verdict (weak #1 / item 3): per-rep times, the device-only machine
    rate at the same shape, the collect_arrays rate (= collect minus
    the ~30 us/read dict-conversion tax), and the engine anatomy."""
    from acc_genomics_tpu.engine.genomics_engine import GenomicsEngine
    from acc_genomics_tpu.io.synth import gen_reference_with_repeats, gen_smem_reads

    rng = np.random.default_rng(0)
    if n_reads is None:
        n_reads = 65536 if on_tpu else 128  # reads/s scales with lanes to ~64K
    K = 3 if on_tpu else 1
    genome = gen_reference_with_repeats(rng, 100_000 if on_tpu else 20_000)
    eng = GenomicsEngine()
    eng.load_reference(genome)
    reads = gen_smem_reads(rng, genome, n_reads, read_len=101)
    eng.smem_collect(reads)  # warm
    iters0 = eng.smem.stats["probe_iters"]
    dts = []
    for _ in range(K):
        t0 = time.perf_counter()
        eng.smem_collect(reads)
        dts.append(time.perf_counter() - t0)
    dt = min(dts)  # min-of-K: the tunnel/host contention swings 2x
    iters = (eng.smem.stats["probe_iters"] - iters0) / K
    out = dict(
        reads_per_s=n_reads / dt,
        probe_gb_s=iters * 2 * 32 * n_reads / dt / 1e9,
        rep_ms=[round(d * 1e3, 1) for d in dts],
    )
    # dict-conversion share: the same shape through collect_arrays (no
    # per-interval dict conversion) — collect minus this is Python time
    seq_tm = np.full((eng.smem.config.read_buckets[1], n_reads), 4, np.uint8)
    lens = np.zeros(n_reads, np.int32)
    for k, r in enumerate(reads):
        seq_tm[: len(r), k] = r
        lens[k] = len(r)
    eng.smem.collect_arrays(seq_tm, lens)  # warm
    eng.smem.reset_anatomy()
    dts_a = []
    for _ in range(K):
        t0 = time.perf_counter()
        eng.smem.collect_arrays(seq_tm, lens)
        dts_a.append(time.perf_counter() - t0)
    out["arrays_reads_per_s"] = n_reads / min(dts_a)
    out["anatomy"] = dict(eng.smem.anatomy)
    out["anatomy_reps"] = K
    if on_tpu:
        rate, _ = _smem_device_rate(eng.smem, seq_tm, lens, K=K)
        out["device_reads_per_s"] = rate
    return out


def bench_smem_100m():
    """SMEM engine at genome scale (100 Mbp cached index, 101 bp reads):
    reads/s through SmemEngine.collect_arrays (upload + machine + D2H)
    plus issued probe-traffic GB/s (2 x 32 B per lane per machine step —
    the DRAM-bandwidth accounting of smem/README.md:23; methodology in
    PERF_NOTES.md).  Requires data/chr100m.fm.npz (drivers/smem_driver.py
    builds it — CLAUDE.md session-start step); a missing index RAISES so
    the skip lands in the artifact as smem_100m_error, never a silent
    drop of the contested metric (round-3 verdict item 1)."""
    import os

    if not os.path.exists("data/chr100m.fm.npz"):
        raise FileNotFoundError(
            "index missing: data/chr100m.fm.npz not built this session "
            "(drivers/smem_driver.py --genome 100000000 --save-npz ...)"
        )
    from acc_genomics_tpu.engine.smem_engine import SmemEngine
    from acc_genomics_tpu.io.synth import gen_smem_reads
    from acc_genomics_tpu.ops.smem.index import FMIndex

    import jax
    import jax.numpy as jnp

    fm = FMIndex.load("data/chr100m.fm.npz")
    rng = np.random.default_rng(0)
    genome = fm.text[: fm.seq_len // 2]
    eng = SmemEngine(fm)
    B = eng.config.batch_size
    Q = 8  # multi-read depth for the workload-scale metrics
    # (device rate at Q=8 measured 89K reads/s vs 80K at Q=4; PERF_NOTES)
    reads = gen_smem_reads(rng, genome, Q * B, read_len=101)
    seq_tm = np.full((128, Q * B), 4, np.uint8)
    lens = np.zeros(Q * B, np.int32)
    for k, r in enumerate(reads):
        seq_tm[: len(r), k] = r
        lens[k] = len(r)
    out = {}
    # (a) FROZEN r02/r03 shape: one-batch (Q=1) engine e2e, 65536 reads
    s1, l1 = seq_tm[:, :B], lens[:B]
    eng.collect_arrays(s1, l1)  # warm/compile
    iters0 = eng.stats["probe_iters"]
    K = 3
    eng.reset_anatomy()
    dts = []
    for _ in range(K):
        t0 = time.perf_counter()
        eng.collect_arrays(s1, l1)
        dts.append(time.perf_counter() - t0)
    dt = min(dts)  # min-of-K: tunnel/host contention swings 2x
    iters = (eng.stats["probe_iters"] - iters0) / K
    out["reads_per_s"] = B / dt
    out["rep_ms"] = [round(d * 1e3, 1) for d in dts]
    out["probe_gb_s"] = iters * 2 * 32 * B / dt / 1e9
    out["anatomy_oneshot"] = dict(eng.anatomy)
    # one-shot device-rate companion (chip-only, resident inputs)
    out["device_reads_per_s_oneshot"], _ = _smem_device_rate(eng, s1, l1, K=K)
    # (b) workload scale: Q*B reads through the MULTI-READ machine
    # (engine e2e incl. packed upload, densify, dense fetch)
    eng.collect_arrays(seq_tm, lens)  # warm/compile
    eng.reset_anatomy()
    dts = []
    for _ in range(K):
        t0 = time.perf_counter()
        eng.collect_arrays(seq_tm, lens)
        dts.append(time.perf_counter() - t0)
    out["multi_reads_per_s"] = Q * B / min(dts)
    out["multi_rep_ms"] = [round(d * 1e3, 1) for d in dts]
    out["anatomy_multi"] = dict(eng.anatomy)
    out["anatomy_reps"] = K
    # (c) device-only multi-read rate (the PairHMM-kernel-style number:
    # machine while-loop time on resident inputs, one tiny fetch — the
    # tunnel's MB/s mood swings (a)/(b) by >2x; this is the chip's rate)
    from acc_genomics_tpu.ops.smem.machine import _collect_multi_jit

    packed, lens_q, Qp, mp = eng._multi_pack(seq_tm, lens, B)
    packed_d, lens_d = jnp.asarray(packed), jnp.asarray(lens_q)

    def dev_run():
        _, mem_n, _, _, iters = _collect_multi_jit(
            eng.idx, packed_d, lens_d, params=mp, reads_per_lane=Qp
        )
        return jax.device_get((mem_n[:4], jnp.asarray(iters)))

    _, iters = dev_run()  # warm (compile shared with (b))
    dts = []
    for _ in range(K):
        t0 = time.perf_counter()
        _, iters = dev_run()
        dts.append(time.perf_counter() - t0)
    out["device_reads_per_s"] = Q * B / min(dts)
    out["multi_iters"] = int(iters)
    return out


def bench_extend(on_tpu):
    """Pallas banded extension kernel seeds/s (chained-jit timing)."""
    import jax
    import jax.numpy as jnp

    from acc_genomics_tpu.ops.extend.jax_impl import sw_extend_batch
    from acc_genomics_tpu.ops.extend.kernel import LANES, sw_extend_pallas

    rng = np.random.default_rng(0)
    B, Q, T = (2048, 128, 256) if on_tpu else (256, 64, 128)
    # K deep enough that the one D2H round trip per rep (~12-25 ms on
    # the tunnel) amortizes below ~3% of the window: at K=10 it still
    # added ~1-2 ms/rep, which is the residual artifact-vs-notes gap
    # the round-3 verdict flagged (748K notes vs 508-535K artifact)
    K = 24 if on_tpu else 2
    q_tm = rng.integers(0, 4, (Q, B)).astype(np.int32)
    t_tm = rng.integers(0, 4, (T, B)).astype(np.int32)
    t_tm[:Q] = np.where(rng.random((Q, B)) < 0.95, q_tm, t_tm[:Q])
    qlen = np.full(B, 101, np.int32)
    tlen = np.full(B, 160, np.int32)
    h0 = np.full(B, 25, np.int32)
    args = [jnp.asarray(x) for x in (q_tm, t_tm, qlen, tlen, h0, qlen, qlen)]
    br = jnp.asarray(np.full(B // LANES, 160, np.int32))
    fn = (
        (lambda *a: sw_extend_pallas(*a, br))
        if on_tpu
        else sw_extend_batch
    )

    # one jit around the whole chain + min-of-3: keeps the tunnel's
    # ~25 ms D2H RTT out of the measured window (it was ~1.25 ms/call of
    # noise at K=20 — the source of BENCH_r02's phantom extend regression)
    @jax.jit
    def chain():
        a, out = args[4], None
        for _ in range(K):
            out = fn(args[0], args[1], args[2], args[3], a, args[5], args[6])
            a = a + out["score"] % 2
        return out["score"]

    jax.device_get(chain()[:1])  # compile + sync
    # per-rep times ride into the artifact (extend_kernel_ms_per_rep):
    # the round-3 verdict flagged a 40% artifact-vs-notes gap on this
    # bench; rep-level evidence shows whether a low number is one slow
    # rep (host/tunnel contention) or a uniform slowdown (regression)
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_get(chain()[:1])
        reps.append((time.perf_counter() - t0) / K)
    return B / min(reps), [round(r * 1e3, 2) for r in reps]


def bench_extend_engine(on_tpu):
    """Extend ENGINE e2e seeds/s (pack + upload + kernel + fetch + the
    gscore-vs-clip resolution) — the category the kernel-only number
    can't regress-track (drivers/extend_driver.py distributions)."""
    import time as _t

    from acc_genomics_tpu.engine.genomics_engine import GenomicsEngine

    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 20_000).astype(np.uint8)
    engine = GenomicsEngine()
    n, read_len = (4096 if on_tpu else 64), 101
    seeds = []
    for _ in range(n):
        pos = int(rng.integers(200, len(genome) - 400))
        read = genome[pos : pos + read_len].copy()
        err = rng.random(read_len) < 0.04
        read[err] = (read[err] + rng.integers(1, 4, err.sum())) % 4
        qbeg = int(rng.integers(5, read_len - 30))
        slen = int(rng.integers(19, 25))
        read[qbeg : qbeg + slen] = genome[pos + qbeg : pos + qbeg + slen]
        span = genome[pos - 150 : pos + read_len + 150]
        seeds.append(dict(read=read, rseq=span, qbeg=qbeg,
                          rbeg_off=150 + qbeg, len=slen))
    engine.extend_seeds(seeds)  # warm
    K = 3 if on_tpu else 1
    engine.extend.reset_anatomy()
    dts = []
    for _ in range(K):
        t0 = _t.perf_counter()
        engine.extend_seeds(seeds)
        dts.append(_t.perf_counter() - t0)
    out = dict(
        seeds_per_s=n / min(dts),
        rep_ms=[round(d * 1e3, 1) for d in dts],
        anatomy=dict(engine.extend.anatomy),
        anatomy_reps=K,
    )
    if on_tpu and getattr(engine.extend, "_last_fused", None) is not None:
        # device-only companion: the exact fused program the e2e path
        # dispatched, K chained dependent calls + ONE fetch — splits the
        # anatomy's 'fetch' (RTT + device + D2H) into device vs link
        import jax
        from acc_genomics_tpu.engine.extend_engine import _fused_device_fn

        sig, du8, di32 = engine.extend._last_fused
        fn = _fused_device_fn(sig, engine.extend.use_pallas,
                              engine.extend.params)
        Kd = 8

        @jax.jit
        def chain():
            d, res = di32, None
            for _ in range(Kd):
                res = fn(du8, d)
                # feed one output value back so calls serialize (the
                # +-1 lands on a pad qlen slot during timing only)
                d = d.at[0].add(res[0, 0].astype(d.dtype) % 2)
            return res[0, :2]

        jax.device_get(chain())  # compile + sync
        ddts = []
        for _ in range(3):
            t0 = _t.perf_counter()
            jax.device_get(chain())
            ddts.append(_t.perf_counter() - t0)
        out["device_seeds_per_s"] = n * Kd / min(ddts)
        out["device_ms_per_call"] = round(min(ddts) / Kd * 1e3, 1)
    return out


def bench_hc(on_tpu):
    """HaplotypeCaller-core regions/s: batched process_regions (SW
    realignment + PairHMM likelihoods) over WES-shaped synthetic active
    regions — the composed-model metric so the GATK-side consumer is
    regression-tracked like BWA-MEM (htc-sw/Makefile:44-48 contract)."""
    import time as _t

    from acc_genomics_tpu.engine.genomics_engine import GenomicsEngine
    from acc_genomics_tpu.models.haplotype_caller import HaplotypeCallerCore
    from drivers.hc_driver import gen_region

    rng = np.random.default_rng(0)
    n_regions = 64 if on_tpu else 4
    engine = GenomicsEngine()
    hc = HaplotypeCallerCore(engine)
    regions = [
        gen_region(rng, n_reads=24)[:3] for _ in range(n_regions)
    ]
    hc.process_regions(regions)  # warm
    K = 3 if on_tpu else 1
    hc.reset_anatomy()
    dts = []
    for _ in range(K):
        t0 = _t.perf_counter()
        hc.process_regions(regions)
        dts.append(_t.perf_counter() - t0)
    return dict(
        regions_per_s=n_regions / min(dts),
        rep_ms=[round(d * 1e3, 1) for d in dts],
        anatomy=dict(hc.anatomy),
        anatomy_reps=K,
    )


def bench_bwamem(on_tpu):
    """Fused device BWA-MEM pipeline reads/s at 2 Mbp (SA + text HBM
    resident, one program per batch; models/bwa_mem.py)."""
    import time as _t

    from acc_genomics_tpu.engine.genomics_engine import GenomicsEngine
    from acc_genomics_tpu.io.synth import gen_smem_reads
    from acc_genomics_tpu.models.bwa_mem import BwaMemDevicePipeline

    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 2_000_000 if on_tpu else 20_000).astype(np.uint8)
    eng = GenomicsEngine()
    eng.load_reference(genome)
    pipe = BwaMemDevicePipeline(eng, max_occ=4, flank=100)
    n = 2048 if on_tpu else 32
    reads = gen_smem_reads(rng, genome, n, read_len=101)
    pipe.map_reads_arrays(reads)  # warm
    K = 3 if on_tpu else 1
    dts = []
    for _ in range(K):
        t0 = _t.perf_counter()
        pipe.map_reads_arrays(reads)
        dts.append(_t.perf_counter() - t0)
    return n / min(dts)


def bench_bwamem_100m():
    """Fused BWA-MEM device pipeline at GENOME scale (the 100 Mbp cached
    index; SA + text HBM-resident): reads/s through map_reads_arrays —
    the artifact-backed form of README's 100-500 Mbp claim (round-4
    verdict item 4).  Missing index RAISES (lands as bwamem_100m_error),
    matching bench_smem_100m's no-silent-skip contract.  Reference
    analog: smem/main.cpp:426-453 (bwt_size cap 1e9) feeding the seed
    extension pipeline."""
    import os
    import time as _t

    if not os.path.exists("data/chr100m.fm.npz"):
        raise FileNotFoundError(
            "index missing: data/chr100m.fm.npz not built this session "
            "(drivers/smem_driver.py --genome 100000000 --save-npz ...)"
        )
    from acc_genomics_tpu.engine.genomics_engine import GenomicsEngine
    from acc_genomics_tpu.io.synth import gen_smem_reads
    from acc_genomics_tpu.models.bwa_mem import BwaMemDevicePipeline
    from acc_genomics_tpu.ops.smem.index import FMIndex

    fm = FMIndex.load("data/chr100m.fm.npz")
    rng = np.random.default_rng(0)
    genome = fm.text[: fm.seq_len // 2]
    eng = GenomicsEngine()
    eng.set_index(fm)
    pipe = BwaMemDevicePipeline(eng, max_occ=4, flank=100)
    n = 2048
    reads = gen_smem_reads(rng, genome, n, read_len=101)
    pipe.map_reads_arrays(reads)  # warm (index/SA/text upload + compiles)
    K = 3
    pipe.reset_anatomy()
    dts = []
    for _ in range(K):
        t0 = _t.perf_counter()
        pipe.map_reads_arrays(reads)
        dts.append(_t.perf_counter() - t0)
    return dict(
        reads_per_s=n / min(dts),
        rep_ms=[round(d * 1e3, 1) for d in dts],
        seeds=pipe.stats["seeds"],
        anatomy=dict(pipe.anatomy),
        anatomy_reps=K,
    )


def _retry(fn):
    """One retry for transient tunnel-side compile flakes (a
    'remote_compile: response body closed' killed r05's first SW run;
    the second attempt compiled fine and cached)."""
    try:
        return fn()
    except Exception:
        return fn()


def main():
    import os

    import jax

    # persistent compile cache (same as tests/conftest.py): the bench
    # compiles ~10 multi-second programs; repeat runs in one container
    # (builder A/Bs, the driver's round-end run) hit the cache instead.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax without the knobs: cold compiles only

    on_tpu = jax.devices()[0].platform == "tpu"

    gcups = _retry(lambda: bench_pairhmm(on_tpu))
    baseline = 15.0  # reference PairHMM FPGA avg GCUPS

    extras = {}
    if on_tpu:
        try:
            from benchmarks.pairhmm_e2e_bench import run as e2e_run

            r = _retry(lambda: e2e_run(n_batches=6, quiet=True, dev_gcups=gcups))
            extras["pairhmm_e2e_gcups"] = round(r["e2e_gcups"], 2)
            extras["pairhmm_pack_gcups_core"] = round(
                r["pack_gcups_per_core"], 1
            )
            extras["pairhmm_link_gcups"] = round(r["link_gcups"], 2)
            extras["pairhmm_device_occupancy_pct"] = round(
                r["device_occupancy"] * 100, 1
            )
            # during-stream link anatomy (round-3 verdict item 3): the
            # achieved MB/s while streaming + the launch/finalize split
            # reconcile the e2e number against its own model in-artifact
            extras["pairhmm_stream_mb"] = round(r["stream_bytes"] / 1e6, 1)
            extras["pairhmm_stream_link_mb_s"] = round(
                r["stream_link_gb_s"] * 1e3, 1
            )
            extras["pairhmm_stream_launch_s"] = round(r["stream_launch_s"], 2)
            extras["pairhmm_stream_finalize_s"] = round(
                r["stream_finalize_s"], 2
            )
            extras["pairhmm_link_model_gcups"] = round(
                r["link_model_gcups"], 2
            )
            extras["pairhmm_sampled_link_gb_s"] = round(r["link_gb_s"], 2)
        except Exception as e:
            extras["pairhmm_e2e_error"] = str(e)[:200]
    try:
        sw = _retry(lambda: bench_sw(on_tpu))
        extras["sw_e2e_gcups"] = round(float(sw["gcups"]), 3)
        extras["sw_vs_baseline"] = round(
            float(sw["gcups"] / 0.3), 2  # htc-sw e2e 0.3
        )
        extras["sw_rep_ms"] = sw["rep_ms"]
    except Exception as e:  # never let a sub-bench kill the headline
        extras["sw_error"] = str(e)[:200]
    try:
        r = _retry(lambda: bench_smem(on_tpu))
        extras["smem_reads_per_s"] = round(float(r["reads_per_s"]), 1)
        extras["smem_probe_gb_s"] = round(float(r["probe_gb_s"]), 3)
        extras["smem_rep_ms"] = r["rep_ms"]
        extras["smem_arrays_reads_per_s"] = round(
            float(r["arrays_reads_per_s"]), 1
        )
        if "device_reads_per_s" in r:
            extras["smem_device_reads_per_s"] = round(
                float(r["device_reads_per_s"]), 1
            )
        extras.update(
            _anatomy_extras(r["anatomy"], "smem_toy", r["anatomy_reps"])
        )
    except Exception as e:
        extras["smem_error"] = str(e)[:200]
    if on_tpu:
        try:  # the r02 shape, kept so the cross-round series continues
            r16 = _retry(lambda: bench_smem(on_tpu, n_reads=16384))
            extras["smem_reads_per_s_16k"] = round(
                float(r16["reads_per_s"]), 1
            )
            extras["smem_rep_ms_16k"] = r16["rep_ms"]
            extras["smem_device_reads_per_s_16k"] = round(
                float(r16["device_reads_per_s"]), 1
            )
        except Exception as e:
            extras["smem_16k_error"] = str(e)[:200]
    if on_tpu:
        try:
            r = _retry(bench_smem_100m)
            extras["smem_reads_per_s_100m"] = round(float(r["reads_per_s"]), 1)
            extras["smem_probe_gb_s_100m"] = round(float(r["probe_gb_s"]), 3)
            extras["smem_rep_ms_100m"] = r["rep_ms"]
            extras["smem_device_reads_per_s_100m_oneshot"] = round(
                float(r["device_reads_per_s_oneshot"]), 1
            )
            extras["smem_multi_reads_per_s_100m"] = round(
                float(r["multi_reads_per_s"]), 1
            )
            extras["smem_multi_rep_ms_100m"] = r["multi_rep_ms"]
            extras["smem_device_reads_per_s_100m"] = round(
                float(r["device_reads_per_s"]), 1
            )
            extras["smem_multi_iters_100m"] = r["multi_iters"]
            extras.update(_anatomy_extras(
                r["anatomy_oneshot"], "smem_100m", r["anatomy_reps"]
            ))
            extras.update(_anatomy_extras(
                r["anatomy_multi"], "smem_100m_multi", r["anatomy_reps"]
            ))
        except Exception as e:
            extras["smem_100m_error"] = str(e)[:200]
    try:
        sps, rep_ms = _retry(lambda: bench_extend(on_tpu))
        extras["extend_kernel_seeds_per_s"] = round(float(sps), 1)
        extras["extend_kernel_ms_per_rep"] = rep_ms
    except Exception as e:
        extras["extend_error"] = str(e)[:200]
    try:
        r = _retry(lambda: bench_extend_engine(on_tpu))
        extras["extend_engine_seeds_per_s"] = round(
            float(r["seeds_per_s"]), 1
        )
        extras["extend_engine_rep_ms"] = r["rep_ms"]
        extras.update(
            _anatomy_extras(r["anatomy"], "extend_eng", r["anatomy_reps"])
        )
        if "device_seeds_per_s" in r:
            extras["extend_engine_device_seeds_per_s"] = round(
                r["device_seeds_per_s"], 1
            )
            extras["extend_engine_device_ms_per_call"] = r[
                "device_ms_per_call"
            ]
    except Exception as e:
        extras["extend_engine_error"] = str(e)[:200]
    if on_tpu:
        try:
            extras["bwamem_reads_per_s_2m"] = round(
                float(_retry(lambda: bench_bwamem(True))), 1
            )
        except Exception as e:
            extras["bwamem_error"] = str(e)[:200]
        try:
            r = _retry(bench_bwamem_100m)
            extras["bwamem_reads_per_s_100m"] = round(
                float(r["reads_per_s"]), 1
            )
            extras["bwamem_rep_ms_100m"] = r["rep_ms"]
            extras.update(
                _anatomy_extras(r["anatomy"], "bwamem_100m",
                                r["anatomy_reps"])
            )
        except Exception as e:
            extras["bwamem_100m_error"] = str(e)[:200]
        try:
            r = _retry(lambda: bench_hc(True))
            extras["hc_regions_per_s"] = round(
                float(r["regions_per_s"]), 1
            )
            extras["hc_rep_ms"] = r["rep_ms"]
            extras.update(
                _anatomy_extras(r["anatomy"], "hc", r["anatomy_reps"])
            )
        except Exception as e:
            extras["hc_error"] = str(e)[:200]

    print(
        json.dumps(
            {
                "metric": "pairhmm_effective_gcups_1chip",
                "value": round(float(gcups), 2),
                "unit": "GCUPS",
                "vs_baseline": round(float(gcups / baseline), 2),
                "extras": extras,
            }
        )
    )


if __name__ == "__main__":
    main()
