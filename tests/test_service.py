"""Client/daemon offload service: in-process loopback (LOCAL_BLAZE analog)."""

import pytest
import numpy as np

from acc_genomics_tpu.io.synth import (
    gen_pairhmm_input,
    gen_reference_with_repeats,
    gen_smem_reads,
)
from acc_genomics_tpu.parallel.service import EngineClient, EngineServer
from acc_genomics_tpu.ops.pairhmm.reference import pairhmm_loglik_oracle
from acc_genomics_tpu.ops.smem.index import FMIndex
from acc_genomics_tpu.ops.smem.reference import mem_collect_intv_oracle

pytestmark = pytest.mark.slow  # daemon/multiprocess: minutes of subprocess compiles



def test_loopback_pairhmm_and_smem(rng):
    server = EngineServer().start()
    host, port = server.address
    client = EngineClient(host, port)
    assert client.connected

    # PairHMM over the wire
    reads, haps = gen_pairhmm_input(rng, 4, 2, max_read_len=30, max_hap_len=60)
    lik = client.pairhmm(reads, haps)
    assert lik.shape == (4, 2)
    want = pairhmm_loglik_oracle(
        reads[1]["rs"], reads[1]["q"], reads[1]["i"], reads[1]["d"], reads[1]["c"],
        haps[0],
    )
    assert abs(lik[1, 0] - want) / abs(want) < 5e-3

    # reference load + SMEM over the wire
    genome = gen_reference_with_repeats(rng, 1200)
    client.load_reference(genome)
    smem_reads = gen_smem_reads(rng, genome, 3, read_len=70)
    ivs = client.smem(smem_reads)
    fm = FMIndex.build(genome)
    canon = lambda z: sorted((i["x0"], i["x1"], i["s"], i["start"], i["end"]) for i in z)
    for r, got in zip(smem_reads, ivs):
        assert canon(got) == canon(mem_collect_intv_oracle(fm, r))

    client.shutdown_server()
    server.stop()


def test_loopback_sw_and_extend(rng):
    from acc_genomics_tpu.io.synth import gen_sw_batch
    from acc_genomics_tpu.ops.extend.reference import extend_seed_oracle
    from acc_genomics_tpu.ops.sw.reference import sw_align_oracle

    server = EngineServer().start()
    host, port = server.address
    client = EngineClient(host, port)
    assert client.connected

    # SW over the wire: exact CIGAR + offset vs oracle
    ref, alts = gen_sw_batch(rng, 4, ref_len=60)
    got = client.sw([ref] * len(alts), alts, strategy=0)
    for alt, (cig, off) in zip(alts, got):
        want_cig, want_off = sw_align_oracle(ref, alt, 0)
        assert [tuple(e) for e in want_cig] == cig and want_off == off

    # seed extension over the wire: exact record vs oracle
    genome = gen_reference_with_repeats(rng, 800)
    seeds = []
    for _ in range(5):
        pos = int(rng.integers(60, 600))
        read = genome[pos : pos + 80].copy()
        mut = rng.random(80) < 0.05
        read[mut] = (read[mut] + 1) % 4
        read[30:50] = genome[pos + 30 : pos + 50]  # clean seed region
        lo = pos - 40
        seeds.append(
            dict(read=read, rseq=genome[lo : pos + 120], qbeg=30,
                 rbeg_off=pos + 30 - lo, len=20)
        )
    res = client.extend(seeds)
    for s, r in zip(seeds, res):
        want = extend_seed_oracle(s["read"], s["rseq"], s["qbeg"], s["rbeg_off"], s["len"])
        assert r == {k: want[k] for k in r}

    client.shutdown_server()
    server.stop()


def test_client_fallback_without_server(rng):
    # no daemon on this port: client computes locally (CPU fallback path)
    client = EngineClient("127.0.0.1", 1)  # port 1: nothing listens
    assert not client.connected
    reads, haps = gen_pairhmm_input(rng, 2, 1, max_read_len=16, max_hap_len=24)
    lik = client.pairhmm(reads, haps)
    assert client.used_fallback
    assert lik.shape == (2, 1)
    assert np.isfinite(lik).all()


def test_daemon_loads_persisted_index(rng, tmp_path):
    """LOAD_REF by path: the daemon loads a BWA-format index from disk
    (big read-only state stays with the accelerator owner)."""
    from acc_genomics_tpu.io.bwa_index import save_bwa_index
    from acc_genomics_tpu.ops.smem.index import FMIndex

    genome = gen_reference_with_repeats(rng, 900)
    fm = FMIndex.build(genome)
    prefix = str(tmp_path / "idx")
    save_bwa_index(prefix, fm)

    server = EngineServer().start()
    client = EngineClient(*server.address)
    client.load_reference_path(prefix)
    reads = gen_smem_reads(rng, genome, 2, read_len=60)
    ivs = client.smem(reads)
    canon = lambda z: sorted((i["x0"], i["x1"], i["s"], i["start"], i["end"]) for i in z)
    for r, got in zip(reads, ivs):
        assert canon(got) == canon(mem_collect_intv_oracle(fm, r))
    client.shutdown_server()
    server.stop()


def test_device_trace_smoke(tmp_path):
    from acc_genomics_tpu.utils.timer import device_trace
    import jax.numpy as jnp

    with device_trace(str(tmp_path / "trace")):
        jnp.arange(8).sum().block_until_ready()
    import os

    assert any(os.scandir(str(tmp_path / "trace")))


def test_daemon_cli_conf(rng, tmp_path):
    """The daemon entrypoint: JSON conf -> running server (subprocess),
    client round trip (the Blaze conf/daemon analog)."""
    import json
    import os
    import re
    import subprocess
    import sys

    from acc_genomics_tpu.io.bwa_index import save_bwa_index
    from acc_genomics_tpu.ops.smem.index import FMIndex

    genome = gen_reference_with_repeats(rng, 700)
    fm = FMIndex.build(genome)
    prefix = str(tmp_path / "idx")
    save_bwa_index(prefix, fm)
    conf = dict(
        host="127.0.0.1", port=0, index_prefix=prefix,
        engine=dict(pairhmm=dict(read_buckets=[32, 64], hap_buckets=[64, 128])),
    )
    cpath = tmp_path / "daemon.json"
    cpath.write_text(json.dumps(conf))
    env = dict(os.environ)
    root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, "-m", "acc_genomics_tpu.parallel.service",
         "--conf", str(cpath)],
        env=env, cwd=root, stdout=subprocess.PIPE, text=True,
    )
    try:
        line = ""
        for _ in range(2):
            line = proc.stdout.readline()
            m = re.search(r"listening on ([\d.]+):(\d+)", line)
            if m:
                break
        assert m, line
        client = EngineClient(m.group(1), int(m.group(2)), timeout=30)
        assert client.connected
        reads = gen_smem_reads(rng, genome, 2, read_len=50)
        ivs = client.smem(reads)
        canon = lambda z: sorted(
            (i["x0"], i["x1"], i["s"], i["start"], i["end"]) for i in z
        )
        for r, got in zip(reads, ivs):
            assert canon(got) == canon(mem_collect_intv_oracle(fm, r))
        client.shutdown_server()
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_concurrent_clients(rng):
    """Two clients issue interleaved requests against ONE daemon: the
    engine lock serializes access to the shared engine (jit caches,
    stats, device state), so every response must still be exact."""
    import threading

    genome = gen_reference_with_repeats(rng, 1500)
    fm = FMIndex.build(genome)
    server = EngineServer().start()
    host, port = server.address
    # warm the engine's jit caches through one client first so the
    # concurrent phase exercises the steady-state path too
    warm = EngineClient(host, port)
    warm.load_reference(genome)
    read_sets = [gen_smem_reads(rng, genome, 3, read_len=64) for _ in range(2)]
    warm.smem(read_sets[0][:1])
    warm.close()

    canon = lambda z: sorted(
        (i["x0"], i["x1"], i["s"], i["start"], i["end"]) for i in z
    )
    errs = []

    def client_work(reads):
        try:
            c = EngineClient(host, port)
            assert c.connected
            for _ in range(3):
                ivs = c.smem(reads)
                for r, got in zip(reads, ivs):
                    assert canon(got) == canon(mem_collect_intv_oracle(fm, r))
            c.close()
        except BaseException as e:
            errs.append(e)

    threads = [
        threading.Thread(target=client_work, args=(rs,)) for rs in read_sets
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs

    stop = EngineClient(host, port)
    stop.shutdown_server()
    server.stop()
