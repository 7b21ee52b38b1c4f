"""Model zoo + name registry (mirrors get_model, reference model.py:20-25).

The registry is keyed by the reference's class names so its config grids map
1:1 onto this framework.
"""

from inductive_recommendation_tpu.models.base import BasicModel
from inductive_recommendation_tpu.models.mf import MF
from inductive_recommendation_tpu.models.lightgcn import LightGCN
from inductive_recommendation_tpu.models.igcn import IGCN, IMF

MODELS = {}


def register(cls):
    MODELS[cls.__name__] = cls
    return cls


for _cls in [MF, LightGCN, IGCN, IMF]:
    MODELS[_cls.__name__] = _cls


def get_model(config, dataset):
    """Factory keyed by config['name'] (model.py:20-25)."""
    cls = MODELS[config["name"]]
    return cls(config, dataset)


__all__ = ["BasicModel", "MF", "LightGCN", "MODELS", "get_model", "register"]
