from acc_genomics_tpu.ops.extend.reference import (  # noqa: F401
    sw_extend_oracle,
    extend_seed_oracle,
)
