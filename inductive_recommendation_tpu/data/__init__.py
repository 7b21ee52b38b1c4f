"""Data layer: raw parsers, k-core filtering, temporal split, datasets,
device-side negative sampling.

Reference: dataset.py (274 LoC). The torch ``DataLoader`` + 6 CPU worker
processes of the reference (trainer.py:407) are replaced by a jitted
``jax.random`` sampler that draws whole batches on device (ops in
``data/sampling.py``) — no host workers, no H2D copies per batch.
"""

from inductive_recommendation_tpu.data.dataset import (
    get_dataset,
    BasicDataset,
    ProcessedDataset,
    GowallaDataset,
    YelpDataset,
    AmazonDataset,
    AuxiliaryDataset,
    SyntheticDataset,
    output_data,
    pad_user_lists,
)
from inductive_recommendation_tpu.data.sampling import (
    SamplerState,
    build_sampler_state,
    sample_bpr_batch,
)

__all__ = [
    "get_dataset",
    "BasicDataset",
    "ProcessedDataset",
    "GowallaDataset",
    "YelpDataset",
    "AmazonDataset",
    "AuxiliaryDataset",
    "SyntheticDataset",
    "output_data",
    "pad_user_lists",
    "SamplerState",
    "build_sampler_state",
    "sample_bpr_batch",
]
