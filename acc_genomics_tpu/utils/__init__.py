from acc_genomics_tpu.utils.convert import (  # noqa: F401
    BASE_A,
    BASE_C,
    BASE_T,
    BASE_G,
    BASE_N,
    HAP_PAD,
    encode_bases,
    decode_bases,
    encode_nt4,
)
from acc_genomics_tpu.utils.timer import Timer, timers, scoreboard  # noqa: F401
