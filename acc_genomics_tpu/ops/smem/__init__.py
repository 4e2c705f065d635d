from acc_genomics_tpu.ops.smem.index import FMIndex  # noqa: F401
from acc_genomics_tpu.ops.smem.reference import (  # noqa: F401
    mem_collect_intv_oracle,
    smem_batch_oracle,
)
