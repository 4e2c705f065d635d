"""BWA on-disk index format round-trips (bwa_idx_load/bwa_idx_build parity)."""

import numpy as np
import pytest

from acc_genomics_tpu.io import bwa_index as bio
from acc_genomics_tpu.io.synth import gen_reference_with_repeats, gen_smem_reads
from acc_genomics_tpu.ops.smem.index import FMIndex
from acc_genomics_tpu.ops.smem.reference import mem_collect_intv_oracle

BASES = "ACGT"


def _write_fasta(path, contigs):
    with open(path, "w") as f:
        for name, codes in contigs:
            f.write(f">{name} synthetic\n")
            s = "".join("ACGTN"[c] for c in codes)
            for j in range(0, len(s), 60):
                f.write(s[j : j + 60] + "\n")


def test_lrand48_matches_glibc():
    # glibc reference values for srand48(11); validates the .pac amb stream
    r = bio._LRand48(11)
    import ctypes, ctypes.util

    libc = ctypes.CDLL(ctypes.util.find_library("c"))
    libc.srand48(11)
    got = [r() for _ in range(6)]
    want = [libc.lrand48() for _ in range(6)]
    assert got == want


def test_fasta_and_pac_roundtrip(rng, tmp_path):
    g1 = rng.integers(0, 4, 333).astype(np.uint8)
    g2 = rng.integers(0, 4, 101).astype(np.uint8)
    g2[20:25] = 4  # an N hole
    g2[60] = 4
    fa = tmp_path / "ref.fa"
    _write_fasta(fa, [("chr1", g1), ("chr2", g2)])

    contigs = bio.read_fasta(str(fa))
    assert [c[0] for c in contigs] == ["chr1", "chr2"]
    assert np.array_equal(contigs[0][2], g1)
    assert np.array_equal(contigs[1][2], g2)

    genome, anns = bio.contigs_to_genome(contigs)
    assert anns.l_pac == 434
    assert len(anns.holes) == 2 and anns.holes[0].length == 5
    assert genome.max() <= 3
    # non-hole bases unchanged
    assert np.array_equal(genome[:333], g1)

    bio.write_pac(str(tmp_path / "p.pac"), genome)
    back = bio.read_pac(str(tmp_path / "p.pac"), len(genome))
    assert np.array_equal(back, genome)

    # l % 4 == 0 trailing-byte convention
    bio.write_pac(str(tmp_path / "q.pac"), genome[:400])
    assert np.array_equal(bio.read_pac(str(tmp_path / "q.pac"), 400), genome[:400])


def test_index_save_load_validate(rng, tmp_path):
    genome = gen_reference_with_repeats(rng, 1500)
    fm = FMIndex.build(genome)
    prefix = str(tmp_path / "idx")
    bio.save_bwa_index(prefix, fm)

    fm2, anns = bio.load_bwa_index(prefix, validate=True)
    assert anns.l_pac == len(genome)
    assert fm2.primary == fm.primary
    assert np.array_equal(fm2.bwt, fm.bwt)
    assert np.array_equal(fm2.sa, fm.sa)
    assert np.array_equal(fm2.occ_ckpt, fm.occ_ckpt)

    # corrupt one sa sample: load must reject
    import numpy.lib.format  # noqa: F401

    raw = bytearray(open(prefix + ".sa", "rb").read())
    raw[-4] ^= 0xFF
    open(prefix + ".sa", "wb").write(bytes(raw))
    with pytest.raises(ValueError):
        bio.load_bwa_index(prefix, validate=True)


def test_fasta_to_smem_pipeline(rng, tmp_path):
    """End-to-end: FASTA -> index build -> dump -> load -> SMEM parity."""
    genome = gen_reference_with_repeats(rng, 900)
    fa = tmp_path / "g.fa"
    _write_fasta(fa, [("ctg", genome)])
    prefix = str(tmp_path / "g")
    fm, anns = bio.build_index_from_fasta(str(fa), prefix=prefix)
    fm2, _ = bio.load_bwa_index(prefix)

    reads = gen_smem_reads(rng, genome, 3, read_len=60)
    canon = lambda z: sorted(
        (i["x0"], i["x1"], i["s"], i["start"], i["end"]) for i in z
    )
    for r in reads:
        assert canon(mem_collect_intv_oracle(fm2, r)) == canon(
            mem_collect_intv_oracle(fm, r)
        )

    # contig coordinate resolution
    cid, off = anns.position_to_contig(123)
    assert cid == 0 and off == 123


def test_bwt_file_layout_details(rng, tmp_path):
    # seq_len not a multiple of 128 nor 16: partial final block
    genome = rng.integers(0, 4, 217).astype(np.uint8)
    fm = FMIndex.build(genome)  # seq_len = 434
    path = str(tmp_path / "t.bwt")
    bio.write_bwt(path, fm)
    primary, L2, bwt = bio.read_bwt(path)
    assert primary == fm.primary
    assert np.array_equal(L2, fm.L2)
    assert np.array_equal(bwt, fm.bwt)
    # file size: 5*u64 header + nblk*(4 u64 + data words) + trailing block
    n = fm.seq_len
    n_words = (n + 15) // 16
    nblk = (n + 127) // 128
    want = 5 * 8 + nblk * 4 * 8 + n_words * 4 + 4 * 8
    import os

    assert os.path.getsize(path) == want
