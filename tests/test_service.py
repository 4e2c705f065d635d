"""Client/daemon offload service: in-process loopback (LOCAL_BLAZE analog)."""

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


def test_client_fallback_without_server(rng):
    # no daemon on this port: client computes locally (CPU fallback path)
    client = EngineClient("127.0.0.1", 1)  # port 1: nothing listens
    assert not client.connected
    reads, haps = gen_pairhmm_input(rng, 2, 1, max_read_len=16, max_hap_len=24)
    lik = client.pairhmm(reads, haps)
    assert client.used_fallback
    assert lik.shape == (2, 1)
    assert np.isfinite(lik).all()
