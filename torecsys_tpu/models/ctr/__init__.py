"""CTR models.  Aliases follow ``/root/reference/torecsys/models/ctr/__init__.py:39-53``."""

from torecsys_tpu.models.ctr.deep import (
    DeepAndCrossNetworkModel,
    NeuralCollaborativeFilteringModel,
    ProductNeuralNetworkModel,
    WideAndDeepModel,
    XDeepFactorizationMachineModel,
)
from torecsys_tpu.models.ctr.ffm_deep import (
    DeepFieldAwareFactorizationMachineModel,
    FieldAttentiveDeepFieldAwareFactorizationMachineModel,
)
from torecsys_tpu.models.ctr.fibinet import (
    FeatureImportanceAndBilinearFeatureInteractionNetwork,
)
from torecsys_tpu.models.ctr.fm_family import (
    AttentionalFactorizationMachineModel,
    DeepFactorizationMachineModel,
    FactorizationMachineModel,
    FactorizationMachineSupportedNeuralNetworkModel,
    FieldAwareFactorizationMachineModel,
    LogisticRegressionModel,
    NeuralFactorizationMachineModel,
)
from torecsys_tpu.models.ctr.multitask import (
    DeepMatchingCorrelationPredictionModel,
    DeepMixtureOfExpertsModel,
    ElaboratedEntireSpaceSupervisedMultiTaskModel,
    EntireSpaceMultiTaskModel,
    MultiGateMixtureOfExpertsModel,
)
from torecsys_tpu.models.ctr.session import (
    DeepSessionInterestNetworkModel,
    PositionBiasAwareLearningFrameworkModel,
)

# Reference aliases (models/ctr/__init__.py:39-53)
AFM = AttentionalFactorizationMachineModel
DCN = DeepAndCrossNetworkModel
DeepFFM = DeepFieldAwareFactorizationMachineModel
DeepFM = DeepFactorizationMachineModel
DeepMCP = DeepMatchingCorrelationPredictionModel
DeepMoE = DeepMixtureOfExpertsModel
DSIN = DeepSessionInterestNetworkModel
ESM2 = ElaboratedEntireSpaceSupervisedMultiTaskModel
ESMM = EntireSpaceMultiTaskModel
FATDeepFFM = FieldAttentiveDeepFieldAwareFactorizationMachineModel
FFM = FieldAwareFactorizationMachineModel
FiBiNET = FeatureImportanceAndBilinearFeatureInteractionNetwork
FieldAwareNeuralFactorizationMachine = DeepFieldAwareFactorizationMachineModel
FM = FactorizationMachineModel
FMNN = FactorizationMachineSupportedNeuralNetworkModel
FNFM = DeepFieldAwareFactorizationMachineModel
MMoE = MultiGateMixtureOfExpertsModel
NCF = NeuralCollaborativeFilteringModel
NFM = NeuralFactorizationMachineModel
PAL = PositionBiasAwareLearningFrameworkModel
PNN = ProductNeuralNetworkModel
WideAndDeep = WideAndDeepModel
xDeepFM = XDeepFactorizationMachineModel

__all__ = [
    "AFM",
    "AttentionalFactorizationMachineModel",
    "DCN",
    "DSIN",
    "DeepAndCrossNetworkModel",
    "DeepFFM",
    "DeepFM",
    "DeepFactorizationMachineModel",
    "DeepFieldAwareFactorizationMachineModel",
    "DeepMCP",
    "DeepMatchingCorrelationPredictionModel",
    "DeepMixtureOfExpertsModel",
    "DeepMoE",
    "DeepSessionInterestNetworkModel",
    "ESM2",
    "ESMM",
    "ElaboratedEntireSpaceSupervisedMultiTaskModel",
    "EntireSpaceMultiTaskModel",
    "FATDeepFFM",
    "FFM",
    "FM",
    "FMNN",
    "FNFM",
    "FactorizationMachineModel",
    "FactorizationMachineSupportedNeuralNetworkModel",
    "FeatureImportanceAndBilinearFeatureInteractionNetwork",
    "FiBiNET",
    "FieldAttentiveDeepFieldAwareFactorizationMachineModel",
    "FieldAwareFactorizationMachineModel",
    "FieldAwareNeuralFactorizationMachine",
    "LogisticRegressionModel",
    "MMoE",
    "MultiGateMixtureOfExpertsModel",
    "NCF",
    "NFM",
    "NeuralCollaborativeFilteringModel",
    "NeuralFactorizationMachineModel",
    "PAL",
    "PNN",
    "PositionBiasAwareLearningFrameworkModel",
    "ProductNeuralNetworkModel",
    "WideAndDeep",
    "WideAndDeepModel",
    "XDeepFactorizationMachineModel",
    "xDeepFM",
]
