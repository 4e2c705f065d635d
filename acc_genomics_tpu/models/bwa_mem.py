"""BWA-MEM seeding + extension pipeline.

The composition the reference accelerates for bwa-flow: SMEM seeding
over the FM-index (mem_collect_intv, 40% of BWA-MEM runtime) followed by
banded Smith-Waterman extension of each seed (mem_chain2aln's
ksw_extend).  Chaining/pairing stay host-side concerns of the consumer;
this module turns reads into extended alignment candidates using the
batched TPU engines.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import numpy as np

from acc_genomics_tpu.engine.genomics_engine import GenomicsEngine
from acc_genomics_tpu.ops.smem.index import FMIndex


@dataclasses.dataclass
class SeedHit:
    read_id: int
    qbeg: int
    qend: int
    rbeg: int  # text coordinate of alignment start
    rend: int
    score: int
    true_score: int
    width: int
    occ: int  # occurrence count of the originating SMEM


class BwaMemSeeding:
    def __init__(self, engine: GenomicsEngine, max_occ: int = 8, flank: int = 100):
        self.engine = engine
        self.max_occ = max_occ
        self.flank = flank

    def _positions(self, fm: FMIndex, iv) -> np.ndarray:
        """Text positions of an interval's occurrences via the SA."""
        rows = np.arange(iv["x0"], iv["x0"] + min(iv["s"], self.max_occ))
        return fm.sa[rows]

    def map_reads(self, reads: Sequence[np.ndarray]) -> List[List[SeedHit]]:
        fm = self.engine.smem.fm
        intervals = self.engine.smem_collect(list(reads))
        tasks = []
        meta = []
        text_len = fm.seq_len
        for rid, (read, ivs) in enumerate(zip(reads, intervals)):
            for iv in ivs:
                slen = iv["end"] - iv["start"]
                for pos in self._positions(fm, iv):
                    pos = int(pos)
                    span_lo = max(0, pos - iv["start"] - self.flank)
                    span_hi = min(text_len, pos + slen + (len(read) - iv["end"]) + self.flank)
                    rseq = fm.text[span_lo:span_hi]
                    tasks.append(
                        dict(
                            read=read,
                            rseq=rseq,
                            qbeg=iv["start"],
                            rbeg_off=pos - span_lo,
                            len=slen,
                        )
                    )
                    meta.append((rid, iv, pos, span_lo))
        results = self.engine.extend_seeds(tasks) if tasks else []
        out: List[List[SeedHit]] = [[] for _ in reads]
        for (rid, iv, pos, span_lo), res in zip(meta, results):
            out[rid].append(
                SeedHit(
                    read_id=rid,
                    qbeg=res["qBeg"],
                    qend=iv["end"] + res["qEnd"],
                    rbeg=pos + res["rBeg"],
                    rend=pos + (iv["end"] - iv["start"]) + res["rEnd"],
                    score=res["score"],
                    true_score=res["trueScore"],
                    width=res["width"],
                    occ=iv["s"],
                )
            )
        return out

