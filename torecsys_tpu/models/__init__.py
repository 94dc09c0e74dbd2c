"""Model zoo: 22 CTR models, 2 embedding models, 2 LTR models, plus the
``Sequential`` glue and a name registry.

Parity: ``/root/reference/torecsys/models/`` (see SURVEY.md §2.4 for the full
table).  Model resolution by string name goes through ``MODELS`` /
``get_model`` (reference: ``getattr(torecsys.models, name)``,
``trainer/torecsys_pipeline.py:189``).
"""

from torecsys_tpu.models.base import (
    BaseModel,
    CtrBaseModel,
    EmbBaseModel,
    LtrBaseModel,
    MODELS,
    get_model,
    register_model,
)
from torecsys_tpu.models.ctr import *  # noqa: F401,F403
from torecsys_tpu.models.ctr import __all__ as _ctr_all
from torecsys_tpu.models.emb import MatrixFactorizationModel, StarSpaceModel
from torecsys_tpu.models.ltr import LearningToRankWrapper, PersonalizedReRankingModel
from torecsys_tpu.models.sequential import Sequential

MF = MatrixFactorizationModel
PRM = PersonalizedReRankingModel

__all__ = list(_ctr_all) + [
    "BaseModel",
    "CtrBaseModel",
    "EmbBaseModel",
    "LearningToRankWrapper",
    "LtrBaseModel",
    "MF",
    "MODELS",
    "MatrixFactorizationModel",
    "PRM",
    "PersonalizedReRankingModel",
    "Sequential",
    "StarSpaceModel",
    "get_model",
    "register_model",
]
