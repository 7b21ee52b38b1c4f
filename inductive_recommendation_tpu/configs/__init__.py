"""Experiment grids (reference config.py:1-527), 1:1 name/hyperparameter
parity."""

from inductive_recommendation_tpu.configs.grids import (
    get_gowalla_config,
    get_yelp_config,
    get_amazon_config,
    get_alibaba_config,
    get_ml_config,
    TOPKS,
)

__all__ = [
    "get_gowalla_config",
    "get_yelp_config",
    "get_amazon_config",
    "get_alibaba_config",
    "get_ml_config",
    "TOPKS",
]
