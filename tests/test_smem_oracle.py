"""FM-index + SMEM oracle vs brute force.

The reference tests SMEM by exact comparison against its own baseline;
since we build both sides, the independent check here is brute force:
occurrence counts by naive string search over the indexed text and SMEM
sets by direct maximality enumeration.
"""

import numpy as np
import pytest

from acc_genomics_tpu.io.synth import gen_reference_with_repeats, gen_smem_reads
from acc_genomics_tpu.ops.smem.index import FMIndex, revcomp
from acc_genomics_tpu.ops.smem.reference import (
    MIN_SEED_LEN,
    mem_collect_intv_oracle,
    smem1a_fwdback,
)


def naive_count(text: np.ndarray, pat: np.ndarray) -> int:
    if len(pat) == 0 or len(pat) > len(text):
        return 0
    tv = np.lib.stride_tricks.sliding_window_view(text, len(pat))
    return int((tv == pat).all(axis=1).sum())


@pytest.fixture(scope="module")
def fixture():
    rng = np.random.default_rng(1234)
    genome = gen_reference_with_repeats(rng, 1500, repeat_len=30, n_repeats=5)
    fm = FMIndex.build(genome)
    text = np.concatenate([genome, revcomp(genome)])
    reads = gen_smem_reads(rng, genome, 12, read_len=80, error_rate=0.02)
    return fm, text, reads


def test_occ4_matches_naive(fixture):
    fm, text, _ = fixture
    n = fm.seq_len
    rng = np.random.default_rng(0)
    for k in list(rng.integers(0, n, 20)) + [-1, 0, n - 1, fm.primary, fm.primary - 1]:
        got = fm.occ4(int(k))
        if k == -1:
            want = np.zeros(4, np.int64)
        else:
            kk = int(k) - (int(k) >= fm.primary)
            want = np.bincount(fm.bwt[: kk + 1], minlength=4)[:4]
        np.testing.assert_array_equal(got, want)


def test_backward_extension_counts(fixture):
    fm, text, reads = fixture
    # interval size after extending backward over an exact genome substring
    # equals the naive occurrence count of that substring
    sub = text[100:130]
    ik = fm.set_intv(int(sub[-1]))
    for pos in range(len(sub) - 2, -1, -1):
        ok = fm.extend(ik, 1)
        ik = ok[int(sub[pos])]
    assert ik[2] == naive_count(text, sub)


def test_forward_extension_counts(fixture):
    fm, text, _ = fixture
    sub = text[321:352]
    ik = fm.set_intv(int(sub[0]))
    for pos in range(1, len(sub)):
        ok = fm.extend(ik, 0)
        ik = ok[3 - int(sub[pos])]
    assert ik[2] == naive_count(text, sub)


def brute_smems(text, read, min_len):
    """All super-maximal exact matches of read in text with len >= min_len."""
    n = len(read)
    maximal = []
    for s in range(n):
        if read[s] > 3:
            continue
        # longest match starting at s
        e = s
        while e < n and read[e] <= 3 and naive_count(text, read[s : e + 1]) > 0:
            e += 1
        if e == s:
            continue
        maximal.append((s, e))
    # keep those not contained in a longer one (supermaximal)
    out = set()
    for s, e in maximal:
        contained = any(
            (s2 <= s and e <= e2) and (s2, e2) != (s, e) for s2, e2 in maximal
        )
        if not contained and e - s >= min_len:
            out.add((s, e))
    return out


def test_pass1_finds_supermaximal_matches(fixture):
    fm, text, reads = fixture
    for read in reads[:6]:
        mem = []
        x = 0
        while x < len(read):
            if read[x] < 4:
                x = smem1a_fwdback(fm, read, x, 1, mem)
            else:
                x += 1
        got = {(m["start"], m["end"]) for m in mem}
        want = brute_smems(text, read, MIN_SEED_LEN)
        assert got == want, (sorted(got), sorted(want))
        # occurrence counts must be exact
        for m in mem:
            assert m["s"] == naive_count(text, read[m["start"] : m["end"]])


def test_full_pipeline_counts(fixture):
    fm, text, reads = fixture
    for read in reads[6:9]:
        mem = mem_collect_intv_oracle(fm, read)
        assert len(mem) >= 1
        for m in mem:
            cnt = naive_count(text, read[m["start"] : m["end"]])
            assert m["s"] <= cnt  # pass-2/3 seeds may carry sub-intervals
            assert cnt > 0
            assert m["end"] - m["start"] >= MIN_SEED_LEN


def test_index_save_load(tmp_path, fixture):
    fm, text, _ = fixture
    p = str(tmp_path / "idx.npz")
    fm.save(p)
    from acc_genomics_tpu.ops.smem.index import FMIndex

    fm2 = FMIndex.load(p)
    assert fm2.primary == fm.primary
    np.testing.assert_array_equal(fm2.bwt, fm.bwt)
    np.testing.assert_array_equal(fm2.occ_ckpt, fm.occ_ckpt)
    np.testing.assert_array_equal(fm2.occ4(100), fm.occ4(100))
