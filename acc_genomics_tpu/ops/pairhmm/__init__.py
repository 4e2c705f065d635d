from acc_genomics_tpu.ops.pairhmm.context import PairHMMContext  # noqa: F401
from acc_genomics_tpu.ops.pairhmm.reference import (  # noqa: F401
    pairhmm_oracle,
    pairhmm_loglik_oracle,
)
