"""HaplotypeCaller compute core: the pipeline the reference accelerates
for GATK HC.

Per active region: candidate haplotypes are realigned to the reference
window with full Smith-Waterman + CIGAR (the htc-sw kernel's job,
consumed by Falcon's GATK via lib_htc_sw.so), and every read is scored
against every haplotype with the PairHMM forward likelihood (the pairhmm
kernel's job).  This module composes the two engines into that region
-level step.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import numpy as np

from acc_genomics_tpu.engine.genomics_engine import GenomicsEngine
from acc_genomics_tpu.ops.sw.reference import OVERHANG_SOFTCLIP


@dataclasses.dataclass
class RegionResult:
    likelihoods: np.ndarray  # (n_reads, n_haps) log10
    hap_cigars: List[tuple]  # [(cigar, offset)] per haplotype vs reference
    best_hap: np.ndarray  # (n_reads,) argmax hap per read


class HaplotypeCallerCore:
    def __init__(self, engine: GenomicsEngine, overhang_strategy: int = OVERHANG_SOFTCLIP):
        self.engine = engine
        self.overhang_strategy = overhang_strategy

    def process_region(
        self,
        reference_window: np.ndarray,
        haplotypes: Sequence[np.ndarray],
        reads: Sequence[dict],
    ) -> RegionResult:
        hap_cigars = self.engine.sw_align(
            reference_window, list(haplotypes), self.overhang_strategy
        )
        lik = self.engine.pairhmm_matrix(reads, haplotypes)
        best = np.argmax(lik, axis=1) if len(haplotypes) else np.zeros(len(reads), int)
        return RegionResult(lik, hap_cigars, best)
