"""Vendored reference-format corpus fixtures.

The reference's drivers consume file corpora (pairhmm_test.cpp GetInputs
text format, bwa-sw main_cl.cpp binary record dumps, bwa_idx_load index
files).  Real WES corpora aren't available offline, so these fixtures
are synthetic data FROZEN into the repo in the reference's exact byte
formats with fp64-oracle goldens: the committed bytes are the format
contract (a writer/parser change that breaks compatibility fails the
SHA pins; a numeric regression fails the golden comparison), and the
tests drive the same code paths as the drivers' --real/--records/
--index flags.
"""

import hashlib
import json
import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _sha(name):
    with open(os.path.join(FIX, name), "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def test_fixture_bytes_pinned():
    """The committed files ARE the byte-format contract."""
    with open(os.path.join(FIX, "SHA256.json")) as f:
        pins = json.load(f)
    assert pins, "no pins"
    for name, want in pins.items():
        assert _sha(name) == want, f"fixture {name} changed on disk"


def test_pairhmm_text_corpus_fixture():
    """Parse the reference-format text corpus, run the engine, compare
    against the golden file (hex-int64 doubles are authoritative) at the
    driver's 5e-3 contract — the --real path of drivers/pairhmm_driver."""
    from acc_genomics_tpu.engine.genomics_engine import GenomicsEngine
    from acc_genomics_tpu.io.pairhmm_text import (
        read_pairhmm_input,
        read_pairhmm_output,
    )

    reads, haps = read_pairhmm_input(os.path.join(FIX, "pairhmm_input0"))
    want = read_pairhmm_output(os.path.join(FIX, "pairhmm_output0"))
    eng = GenomicsEngine()
    got = np.asarray(
        eng.pairhmm_matrix(
            [dict(rs=r["rs"], q=r["q"], i=r["i"], d=r["d"], c=r["c"])
             for r in reads],
            haps,
        )
    ).reshape(-1)
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-12)
    assert rel.max() < 5e-3, rel.max()


def test_bwasw_records_fixture():
    """Parse the binary task dump, run the extension engine, and compare
    against the golden result records re-ordered by seed index — the
    reference driver's protocol (main_cl.cpp:191-247)."""
    from acc_genomics_tpu.engine.genomics_engine import GenomicsEngine
    from acc_genomics_tpu.io import bwasw_records as br

    genome = np.load(os.path.join(FIX, "bwasw_genome.npy"))
    tasks = br.read_task_file(os.path.join(FIX, "bwasw_tasks0.bin"))
    want = br.read_results(os.path.join(FIX, "bwasw_results0.bin"))
    eng = GenomicsEngine()
    got = br.run_tasks(eng.extend, genome, tasks)
    by_idx = {r["seed_index"]: r for r in got}
    assert len(got) == len(want)
    for w in want:
        g = by_idx[w["seed_index"]]
        assert g == w, (w["seed_index"], g, w)


def test_bwa_index_fixture_roundtrip():
    """Load the frozen BWA-format index files, verify them against a
    fresh build of the same genome, and run a device SMEM batch on the
    loaded index (the drivers' --index path)."""
    from acc_genomics_tpu.io.bwa_index import load_bwa_index
    from acc_genomics_tpu.ops.smem.index import FMIndex
    from acc_genomics_tpu.ops.smem.machine import smem_batch_machine
    from acc_genomics_tpu.ops.smem.reference import mem_collect_intv_oracle

    genome = np.load(os.path.join(FIX, "bwaidx_genome.npy"))
    fm, anns = load_bwa_index(os.path.join(FIX, "bwaidx"))
    fresh = FMIndex.build(genome)
    np.testing.assert_array_equal(fm.bwt, fresh.bwt)
    assert fm.primary == fresh.primary
    np.testing.assert_array_equal(fm.L2, fresh.L2)
    assert anns.contigs[0].length == len(genome)

    rng = np.random.default_rng(3)
    reads = [genome[p : p + 60].copy()
             for p in rng.integers(0, len(genome) - 60, 4)]
    got, ovf, _ = smem_batch_machine(fm, reads, seq_len=64)
    canon = lambda z: sorted(
        (i["x0"], i["x1"], i["s"], i["start"], i["end"]) for i in z
    )
    for g, r in zip(got, reads):
        assert canon(g) == canon(mem_collect_intv_oracle(fresh, r))
