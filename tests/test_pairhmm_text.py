"""Reference-format PairHMM text corpus round trip + driver protocol."""

import numpy as np

from acc_genomics_tpu.io.pairhmm_text import (
    read_pairhmm_input,
    read_pairhmm_output,
    write_pairhmm_input,
    write_pairhmm_output,
)
from acc_genomics_tpu.io.synth import gen_pairhmm_input
from acc_genomics_tpu.ops.pairhmm.reference import pairhmm_loglik_oracle


def test_input_roundtrip(rng, tmp_path):
    reads, haps = gen_pairhmm_input(rng, 3, 2, max_read_len=25, max_hap_len=40)
    p = str(tmp_path / "input0")
    write_pairhmm_input(p, reads, haps)
    r2, h2 = read_pairhmm_input(p)
    assert len(r2) == 3 and len(h2) == 2
    for a, b in zip(reads, r2):
        for k in ("rs", "q", "i", "d", "c"):
            np.testing.assert_array_equal(a[k], b[k])
    for a, b in zip(haps, h2):
        np.testing.assert_array_equal(a, b)


def test_output_hex_int64_authoritative(rng, tmp_path):
    reads, haps = gen_pairhmm_input(rng, 2, 2, max_read_len=20, max_hap_len=30)
    want = np.array(
        [
            pairhmm_loglik_oracle(r["rs"], r["q"], r["i"], r["d"], r["c"], h)
            for r in reads
            for h in haps
        ]
    )
    p = str(tmp_path / "output0")
    write_pairhmm_output(p, want)
    got = read_pairhmm_output(p)
    # bit-exact: the int64 token preserves the double exactly
    np.testing.assert_array_equal(got, want)


def test_corpus_through_engine(rng, tmp_path):
    """The --real protocol: corpus file -> engine -> 5e-3 vs golden."""
    from acc_genomics_tpu.engine.genomics_engine import GenomicsEngine

    reads, haps = gen_pairhmm_input(rng, 4, 2, max_read_len=30, max_hap_len=50)
    pi = str(tmp_path / "input0")
    write_pairhmm_input(pi, reads, haps)
    golden = np.array(
        [
            pairhmm_loglik_oracle(r["rs"], r["q"], r["i"], r["d"], r["c"], h)
            for r in reads
            for h in haps
        ]
    )
    po = str(tmp_path / "output0")
    write_pairhmm_output(po, golden)

    r2, h2 = read_pairhmm_input(pi)
    lik = GenomicsEngine().pairhmm_matrix(r2, h2).reshape(-1)
    g2 = read_pairhmm_output(po)
    rel = np.abs(lik - g2) / np.abs(g2)
    assert rel.max() < 5e-3
