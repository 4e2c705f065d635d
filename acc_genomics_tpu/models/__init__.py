from acc_genomics_tpu.models.haplotype_caller import HaplotypeCallerCore  # noqa: F401
from acc_genomics_tpu.models.bwa_mem import BwaMemSeeding  # noqa: F401
