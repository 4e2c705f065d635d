"""Synthetic workload generators mirroring the reference test drivers.

* PairHMM: reads with N(30,5) base quals (floor 6), N(40,1) indel GOPs
  (floor 1), constant GCP 10, uniform lengths in [cap/4, cap]
  (pairhmm/xlnx/pairhmm_test.cpp:21-82).
* SW (HTC): random ~refLen reference, alts = ref with +-5% length jitter and
  10% point mutations (htc-sw/host/sw_host.cpp:145-182).
* SMEM: random A/C/G/T reads over a random reference with embedded exact
  repeats so SMEMs of useful length exist.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from acc_genomics_tpu.utils.convert import encode_bases


def gen_pairhmm_input(
    rng: np.random.Generator,
    n_reads: int,
    n_haps: int,
    max_read_len: int = 191,
    max_hap_len: int = 1024,
    min_read_len: int | None = None,
):
    """Returns (reads, haps): reads is a list of dicts with rs/q/i/d/c arrays,
    haps a list of base-code arrays."""
    reads = []
    lo_r = min_read_len if min_read_len is not None else max(1, max_read_len // 4)
    for _ in range(n_reads):
        ln = int(rng.integers(lo_r, max_read_len + 1))
        reads.append(
            dict(
                rs=rng.integers(0, 4, ln).astype(np.uint8),
                q=np.clip(rng.normal(30.0, 5.0, ln), 6, 127).astype(np.uint8),
                i=np.clip(rng.normal(40.0, 1.0, ln), 1, 127).astype(np.uint8),
                d=np.clip(rng.normal(40.0, 1.0, ln), 1, 127).astype(np.uint8),
                c=np.full(ln, 10, dtype=np.uint8),
            )
        )
    haps = []
    for _ in range(n_haps):
        ln = int(rng.integers(max(1, max_hap_len // 4), max_hap_len + 1))
        haps.append(rng.integers(0, 4, ln).astype(np.uint8))
    return reads, haps


def gen_pairhmm_pairs(rng, n_pairs, max_read_len=63, max_hap_len=128):
    """Flat list of independent (read, hap) testcases for kernel tests."""
    reads, haps = gen_pairhmm_input(
        rng, n_pairs, n_pairs, max_read_len, max_hap_len
    )
    return [dict(hap=haps[k], **reads[k]) for k in range(n_pairs)]


def gen_sw_batch(
    rng: np.random.Generator,
    batch: int,
    ref_len: int = 286,
    mutation_rate: float = 0.10,
    len_jitter: float = 0.05,
) -> Tuple[np.ndarray, List[np.ndarray]]:
    """(ref_codes, [alt_codes...]) in PairHMM base coding (no Ns)."""
    ref = rng.integers(0, 4, ref_len).astype(np.uint8)
    alts = []
    for _ in range(batch):
        jitter = int(rng.integers(-int(ref_len * len_jitter), int(ref_len * len_jitter) + 1))
        ln = max(8, ref_len + jitter)
        if ln <= ref_len:
            alt = ref[:ln].copy()
        else:
            alt = np.concatenate([ref, rng.integers(0, 4, ln - ref_len).astype(np.uint8)])
        mut = rng.random(ln) < mutation_rate
        alt[mut] = (alt[mut] + rng.integers(1, 4, mut.sum())) % 4
        alts.append(alt.astype(np.uint8))
    return ref, alts


def gen_reference_with_repeats(
    rng: np.random.Generator, length: int, repeat_len: int = 40, n_repeats: int = 8
) -> np.ndarray:
    """Random nt4 genome with planted repeats (so SMEM searches hit
    multi-occurrence intervals, not just unique matches)."""
    genome = rng.integers(0, 4, length).astype(np.uint8)
    if n_repeats > 1 and length > 4 * repeat_len:
        motif = rng.integers(0, 4, repeat_len).astype(np.uint8)
        for _ in range(n_repeats):
            pos = int(rng.integers(0, length - repeat_len))
            genome[pos : pos + repeat_len] = motif
    return genome


def gen_smem_reads(
    rng: np.random.Generator,
    genome: np.ndarray,
    n_reads: int,
    read_len: int = 101,
    error_rate: float = 0.01,
    ambig_rate: float = 0.002,
) -> List[np.ndarray]:
    """Reads sampled from the genome with point errors and occasional Ns."""
    reads = []
    glen = len(genome)
    for _ in range(n_reads):
        pos = int(rng.integers(0, max(1, glen - read_len)))
        read = genome[pos : pos + read_len].copy()
        err = rng.random(len(read)) < error_rate
        read[err] = (read[err] + rng.integers(1, 4, err.sum())) % 4
        amb = rng.random(len(read)) < ambig_rate
        read[amb] = 4
        reads.append(read.astype(np.uint8))
    return reads
