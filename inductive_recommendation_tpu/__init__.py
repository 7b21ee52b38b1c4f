"""TPU-native inductive graph-recommendation framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
umaDosey/Inductive-Recommendation (inductive graph collaborative filtering:
IGCN + DOSE contrastive-augmentation family, plus the classic recommender
baselines), built TPU-first:

- one shared sparse-graph engine (padded COO / ELL layouts, static shapes)
  instead of per-model copy-pasted DGL propagation loops,
- kernels as first-class components (``ops/``) with jnp reference and Pallas
  TPU implementations behind a single interface,
- functional models (pure ``init``/``apply`` over parameter pytrees),
- sharding via ``jax.sharding.Mesh`` + NamedSharding (``parallel/``),
- vectorized full-catalog evaluation (masked scoring, top-k, P/R/NDCG@k) and
  the six-slice inductive (cold-start) evaluation protocol.

Reference layer map: /root/reference/{config,dataset,model,trainer,utils}.py
(see SURVEY.md for the full component inventory this package reproduces).
"""

__version__ = "0.1.0"

_LAZY = {
    "get_dataset": "inductive_recommendation_tpu.data",
    "get_model": "inductive_recommendation_tpu.models",
    "get_trainer": "inductive_recommendation_tpu.train",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = ["get_dataset", "get_model", "get_trainer", "__version__"]
