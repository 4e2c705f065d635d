from acc_genomics_tpu.ops.sw.reference import (  # noqa: F401
    OVERHANG_SOFTCLIP,
    OVERHANG_INDEL,
    OVERHANG_LEADING_INDEL,
    OVERHANG_IGNORE,
    sw_align_oracle,
)
