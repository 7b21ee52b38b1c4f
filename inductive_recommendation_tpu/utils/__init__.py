"""Run utilities (reference utils.py:13-30, 292-305) + shared device helpers."""

from inductive_recommendation_tpu.utils.run import set_seed, init_run, Unbuffered
from inductive_recommendation_tpu.utils.profiles import dense_profiles

__all__ = ["set_seed", "init_run", "Unbuffered", "dense_profiles"]
