"""Evaluation: vectorized Precision/Recall/NDCG@k, masked full-catalog
retrieval, and the six-slice inductive (cold-start) protocol."""

from inductive_recommendation_tpu.eval.metrics import calculate_metrics
from inductive_recommendation_tpu.eval.evaluator import Evaluator

__all__ = ["calculate_metrics", "Evaluator"]
