"""CTR interaction layers.

Aliases follow the reference (``/root/reference/torecsys/layers/ctr/__init__.py:23-35``).
"""

from torecsys_tpu.layers.ctr.attention import (
    BiasEncodingLayer,
    ComposeExcitationNetworkLayer,
    PositionBiasAwareLearningFrameworkLayer,
    PositionEmbeddingLayer,
)
from torecsys_tpu.layers.ctr.cin import CompressInteractionNetworkLayer
from torecsys_tpu.layers.ctr.cross import (
    BilinearInteractionLayer,
    BilinearNetworkLayer,
    CrossNetworkLayer,
    FieldAllTypeBilinear,
    FieldEachTypeBilinear,
    FieldInteractionTypeBilinear,
)
from torecsys_tpu.layers.ctr.dense import MultilayerPerceptionLayer, WideLayer
from torecsys_tpu.layers.ctr.factorization import (
    AttentionalFactorizationMachineLayer,
    FactorizationMachineLayer,
    FieldAwareFactorizationMachineLayer,
)
from torecsys_tpu.layers.ctr.moe import MixtureOfExpertsLayer
from torecsys_tpu.layers.ctr.product import (
    InnerProductNetworkLayer,
    OuterProductNetworkLayer,
)
from torecsys_tpu.layers.ctr.routing import DynamicRoutingLayer, resolve_num_capsules

# Reference aliases (layers/ctr/__init__.py:23-35)
AFMLayer = AttentionalFactorizationMachineLayer
CENLayer = ComposeExcitationNetworkLayer
CINLayer = CompressInteractionNetworkLayer
DenseLayer = MultilayerPerceptionLayer
DNNLayer = MultilayerPerceptionLayer
FFMLayer = FieldAwareFactorizationMachineLayer
FMLayer = FactorizationMachineLayer
FullyConnectLayer = MultilayerPerceptionLayer
FeedForwardLayer = MultilayerPerceptionLayer
MOELayer = MixtureOfExpertsLayer
PALLayer = PositionBiasAwareLearningFrameworkLayer
SqueezeAndExcitationNetworkLayer = ComposeExcitationNetworkLayer
SENETLayer = ComposeExcitationNetworkLayer

__all__ = [
    "AFMLayer",
    "AttentionalFactorizationMachineLayer",
    "BiasEncodingLayer",
    "BilinearInteractionLayer",
    "BilinearNetworkLayer",
    "CENLayer",
    "CINLayer",
    "ComposeExcitationNetworkLayer",
    "CompressInteractionNetworkLayer",
    "CrossNetworkLayer",
    "DenseLayer",
    "DNNLayer",
    "DynamicRoutingLayer",
    "FFMLayer",
    "FMLayer",
    "FactorizationMachineLayer",
    "FeedForwardLayer",
    "FieldAllTypeBilinear",
    "FieldAwareFactorizationMachineLayer",
    "FieldEachTypeBilinear",
    "FieldInteractionTypeBilinear",
    "FullyConnectLayer",
    "InnerProductNetworkLayer",
    "MOELayer",
    "MixtureOfExpertsLayer",
    "MultilayerPerceptionLayer",
    "OuterProductNetworkLayer",
    "PALLayer",
    "PositionBiasAwareLearningFrameworkLayer",
    "PositionEmbeddingLayer",
    "SENETLayer",
    "SqueezeAndExcitationNetworkLayer",
    "WideLayer",
    "resolve_num_capsules",
]
