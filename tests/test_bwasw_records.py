"""BWA-SW binary record formats: round trips + end-to-end vs oracle."""

import numpy as np

from acc_genomics_tpu.io import bwasw_records as br
from acc_genomics_tpu.ops.extend.reference import extend_seed_oracle


def _synth_tasks(rng, genome, n_reads=4):
    tasks = []
    seed_idx = 0
    for _ in range(n_reads):
        pos = int(rng.integers(200, len(genome) - 400))
        read = genome[pos : pos + 101].copy()
        mut = rng.random(101) < 0.05
        read[mut] = (read[mut] + 1) % 4
        chains = []
        for _c in range(int(rng.integers(1, 3))):
            r0 = pos - int(rng.integers(50, 150))
            r1 = pos + 101 + int(rng.integers(50, 150))
            seeds = []
            for _s in range(int(rng.integers(1, 4))):
                qb = int(rng.integers(5, 70))
                ln = int(rng.integers(19, 25))
                read[qb : qb + ln] = genome[pos + qb : pos + qb + ln]
                seeds.append(br.Seed(seed_idx, pos + qb, qb, ln))
                seed_idx += 1
            chains.append(br.Chain(r0, r1, seeds))
        tasks.append(br.ReadTask(read, chains))
    return tasks


def test_task_file_roundtrip(rng, tmp_path):
    genome = rng.integers(0, 4, 5000).astype(np.uint8)
    tasks = _synth_tasks(rng, genome)
    p = str(tmp_path / "tasks.bin")
    br.write_task_file(p, tasks)
    back = br.read_task_file(p)
    assert len(back) == len(tasks)
    for a, b in zip(tasks, back):
        assert np.array_equal(a.read, b.read)
        assert len(a.chains) == len(b.chains)
        for ca, cb in zip(a.chains, b.chains):
            assert (ca.rmax0, ca.rmax1) == (cb.rmax0, cb.rmax1)
            assert [
                (s.index, s.rbeg, s.qbeg, s.length) for s in ca.seeds
            ] == [(s.index, s.rbeg, s.qbeg, s.length) for s in cb.seeds]
    assert br.count_tasks(p) == sum(len(c.seeds) for t in tasks for c in t.chains)


def test_results_roundtrip_with_negatives(tmp_path):
    results = [
        dict(seed_index=3, qBeg=-12, qEnd=30, rBeg=-45, rEnd=28,
             score=77, trueScore=80, width=100),
        dict(seed_index=0, qBeg=0, qEnd=0, rBeg=0, rEnd=0,
             score=19, trueScore=19, width=100),
    ]
    p = str(tmp_path / "res.bin")
    br.write_results(p, results)
    back = br.read_results(p)
    assert back == results


def test_run_tasks_matches_oracle(rng, tmp_path):
    """Full loop: write task file -> read -> run engine -> compare each
    record against the oracle, reordered by seed_index (the reference
    driver's golden protocol, main_cl.cpp:191-247)."""
    from acc_genomics_tpu.engine.genomics_engine import GenomicsEngine

    genome = rng.integers(0, 4, 5000).astype(np.uint8)
    tasks = _synth_tasks(rng, genome)
    p = str(tmp_path / "tasks.bin")
    br.write_task_file(p, tasks)
    tasks2 = br.read_task_file(p)
    eng = GenomicsEngine()
    got = br.run_tasks(eng.extend, genome, tasks2)
    by_idx = {r["seed_index"]: r for r in got}
    for t in tasks:
        for ch in t.chains:
            rseq = genome[ch.rmax0 : ch.rmax1]
            for s in ch.seeds:
                want = extend_seed_oracle(
                    t.read, rseq, s.qbeg, s.rbeg - ch.rmax0, s.length
                )
                g = by_idx[s.index]
                assert all(g[k] == want[k] for k in want), (s.index, g, want)

    # golden-file loop: dump results, reread, compare exactly
    pg = str(tmp_path / "golden.bin")
    br.write_results(pg, got)
    assert br.read_results(pg) == got
