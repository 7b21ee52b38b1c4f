"""Model zoo + name registry (mirrors get_model, reference model.py:20-25).

The registry is keyed by the reference's class names so its config grids map
1:1 onto this framework.
"""

from inductive_recommendation_tpu.models.base import BasicModel
from inductive_recommendation_tpu.models.mf import MF
from inductive_recommendation_tpu.models.lightgcn import LightGCN
from inductive_recommendation_tpu.models.igcn import IGCN, IMF
from inductive_recommendation_tpu.models.att_igcn import AttIGCN
from inductive_recommendation_tpu.models.ngcf import NGCF
from inductive_recommendation_tpu.models.imcgae import IMCGAE
from inductive_recommendation_tpu.models.itemknn import ItemKNN
from inductive_recommendation_tpu.models.popularity import Popularity
from inductive_recommendation_tpu.models.multivae import MultiVAE
from inductive_recommendation_tpu.models.neumf import NeuMF
from inductive_recommendation_tpu.models.idcf import IDCF_LGCN
from inductive_recommendation_tpu.models.sgl import SGL, HALF
from inductive_recommendation_tpu.models.dose import (
    DOSE_aug,
    DOSE_aug2,
    DOSE_aug3,
    DOSE_aug4,
    DOSE_drop,
    DOSE_drop2,
    DOSE_drop3,
    DOSE_aug_drop,
    DOSE_aug_drop2,
    DOSE_aug_drop3,
    DOSE_test,
    TEST,
    TEST2,
)

MODELS = {}


def register(cls):
    MODELS[cls.__name__] = cls
    return cls


for _cls in [
    MF,
    LightGCN,
    IGCN,
    IMF,
    AttIGCN,
    NGCF,
    IMCGAE,
    ItemKNN,
    Popularity,
    MultiVAE,
    NeuMF,
    IDCF_LGCN,
    SGL,
    HALF,
    DOSE_aug,
    DOSE_aug2,
    DOSE_aug3,
    DOSE_aug4,
    DOSE_drop,
    DOSE_drop2,
    DOSE_drop3,
    DOSE_aug_drop,
    DOSE_aug_drop2,
    DOSE_aug_drop3,
    DOSE_test,
    TEST,
    TEST2,
]:
    MODELS[_cls.__name__] = _cls


def get_model(config, dataset):
    """Factory keyed by config['name'] (model.py:20-25)."""
    cls = MODELS[config["name"]]
    return cls(config, dataset)


__all__ = ["BasicModel", "MF", "LightGCN", "MODELS", "get_model", "register"]
