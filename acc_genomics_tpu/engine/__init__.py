from acc_genomics_tpu.engine.bucketing import BucketPlan, plan_buckets  # noqa: F401
from acc_genomics_tpu.engine.pairhmm_engine import PairHMMEngine  # noqa: F401
