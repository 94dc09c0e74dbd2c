"""FM-family CTR models: LR, FM, FMNN, FFM, AFM, NFM, DeepFM.

Parity (composition per the reference forwards):
* LR     — ``/root/reference/torecsys/models/ctr/logistic_regression.py:9-62``
* FM     — ``models/ctr/factorization_machine.py:10-71``
* FMNN   — ``models/ctr/factorization_machine_supported_neural_network.py:10-101``
* FFM    — ``models/ctr/field_aware_factorization_machine.py:10-81``
* AFM    — ``models/ctr/attentional_factorization_machine.py:10-87``
* NFM    — ``models/ctr/neural_factorization_machine.py:10-95``
* DeepFM — ``models/ctr/deep_fm.py:10-110``

All return raw ``(B, 1)`` scores except LR (sigmoid applied, like the
reference).
"""

from __future__ import annotations

from typing import Callable, Tuple

import flax.linen as nn

from torecsys_tpu.layers.precision import Dense as pdense
import jax.numpy as jnp

from torecsys_tpu.layers.ctr import (
    AttentionalFactorizationMachineLayer,
    FactorizationMachineLayer,
    FieldAwareFactorizationMachineLayer,
    MultilayerPerceptionLayer,
)
from torecsys_tpu.models.base import CtrBaseModel, register_model


def _bias(module: nn.Module, name: str = "bias") -> jnp.ndarray:
    return module.param(name, nn.initializers.uniform(scale=1.0), (1, 1))


@register_model("LR")
class LogisticRegressionModel(CtrBaseModel):
    """Linear + sigmoid over flattened first-order features.

    ``(feat_inputs (B, N, 1)) → (B, output_size)`` probabilities.
    """

    output_size: int = 1
    outputs_probability = True

    @nn.compact
    def __call__(self, feat_inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        b = feat_inputs.shape[0]
        flat = feat_inputs.reshape(b, -1)
        return nn.sigmoid(pdense(self.output_size, name="linear")(flat))


@register_model("FM")
class FactorizationMachineModel(CtrBaseModel):
    """bias + Σ first-order + Σ_E FM second-order → ``(B, 1)``."""

    use_bias: bool = True
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, feat_inputs: jnp.ndarray, emb_inputs: jnp.ndarray,
                 training: bool = False) -> jnp.ndarray:
        fm_first = jnp.sum(feat_inputs, axis=1)  # (B, 1)
        fm_second = FactorizationMachineLayer(dropout_rate=self.dropout_rate, name="fm")(
            emb_inputs, training=training
        )
        out = jnp.sum(fm_second, axis=1, keepdims=True) + fm_first
        if self.use_bias:
            out = out + _bias(self)
        return out


@register_model("FMNN", "FactorizationMachineSupportedNeuralNetwork")
class FactorizationMachineSupportedNeuralNetworkModel(CtrBaseModel):
    """concat(first-order, FM) → DNN → ``(B, 1)``."""

    deep_output_size: int = 1
    deep_layer_sizes: Tuple[int, ...] = (64, 64)
    fm_dropout_rate: float = 0.0
    deep_dropout_rate: float = 0.0
    activation: Callable[[jnp.ndarray], jnp.ndarray] = nn.relu

    @nn.compact
    def __call__(self, feat_inputs: jnp.ndarray, emb_inputs: jnp.ndarray,
                 training: bool = False) -> jnp.ndarray:
        b = feat_inputs.shape[0]
        fm_first = feat_inputs.reshape(b, -1)  # (B, N)
        fm_second = FactorizationMachineLayer(dropout_rate=self.fm_dropout_rate, name="fm")(
            emb_inputs, training=training
        )  # (B, E)
        fm_out = jnp.concatenate([fm_first, fm_second], axis=1)
        return MultilayerPerceptionLayer(
            output_size=self.deep_output_size,
            layer_sizes=self.deep_layer_sizes,
            dropout_rate=self.deep_dropout_rate,
            activation=self.activation,
            name="deep",
        )(fm_out, training=training)


@register_model("FFM")
class FieldAwareFactorizationMachineModel(CtrBaseModel):
    """bias + Σ first-order + ΣΣ FFM interaction → ``(B, 1)``."""

    num_fields: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, feat_inputs: jnp.ndarray, field_emb_inputs: jnp.ndarray,
                 training: bool = False) -> jnp.ndarray:
        ffm_first = jnp.sum(feat_inputs, axis=1)  # (B, 1)
        ffm_second = FieldAwareFactorizationMachineLayer(
            num_fields=self.num_fields, dropout_rate=self.dropout_rate, name="ffm"
        )(field_emb_inputs, training=training)  # (B, P, E)
        out = jnp.sum(ffm_second, axis=(1, 2))[:, None] + ffm_first
        return out + _bias(self)


@register_model("AFM")
class AttentionalFactorizationMachineModel(CtrBaseModel):
    """bias + Σ first-order + Σ_E AFM attention-pooled interaction → ``(B, 1)``."""

    embed_size: int
    attn_size: int
    use_bias: bool = True
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, feat_inputs: jnp.ndarray, emb_inputs: jnp.ndarray,
                 training: bool = False) -> jnp.ndarray:
        afm_first = jnp.sum(feat_inputs, axis=1)  # (B, 1)
        afm_second, _ = AttentionalFactorizationMachineLayer(
            embed_size=self.embed_size,
            attn_size=self.attn_size,
            dropout_rate=self.dropout_rate,
            name="afm",
        )(emb_inputs, training=training)
        out = jnp.sum(afm_second, axis=1, keepdims=True) + afm_first
        if self.use_bias:
            out = out + _bias(self)
        return out


@register_model("NFM", "NeuralFactorizationMachine")
class NeuralFactorizationMachineModel(CtrBaseModel):
    """bias + Σ first-order + DNN(FM(emb)) → ``(B, 1)``."""

    deep_layer_sizes: Tuple[int, ...] = (64, 64)
    use_bias: bool = True
    fm_dropout_rate: float = 0.0
    deep_dropout_rate: float = 0.0
    activation: Callable[[jnp.ndarray], jnp.ndarray] = nn.relu

    @nn.compact
    def __call__(self, feat_inputs: jnp.ndarray, emb_inputs: jnp.ndarray,
                 training: bool = False) -> jnp.ndarray:
        nfm_first = jnp.sum(feat_inputs, axis=1)  # (B, 1)
        fm_out = FactorizationMachineLayer(dropout_rate=self.fm_dropout_rate, name="fm")(
            emb_inputs, training=training
        )
        nfm_second = MultilayerPerceptionLayer(
            output_size=1,
            layer_sizes=self.deep_layer_sizes,
            dropout_rate=self.deep_dropout_rate,
            activation=self.activation,
            name="deep",
        )(fm_out, training=training)
        out = nfm_second + nfm_first
        if self.use_bias:
            out = out + _bias(self)
        return out


@register_model("DeepFM")
class DeepFactorizationMachineModel(CtrBaseModel):
    """(Σ first-order + Σ FM) + DNN(flat embeddings) → ``(B, 1)``."""

    deep_layer_sizes: Tuple[int, ...] = (64, 64)
    fm_dropout_rate: float = 0.0
    deep_dropout_rate: float = 0.0
    activation: Callable[[jnp.ndarray], jnp.ndarray] = nn.relu

    @nn.compact
    def __call__(self, feat_inputs: jnp.ndarray, emb_inputs: jnp.ndarray,
                 training: bool = False) -> jnp.ndarray:
        b = feat_inputs.shape[0]
        fm_first = feat_inputs.reshape(b, -1)  # (B, N)
        fm_second = FactorizationMachineLayer(dropout_rate=self.fm_dropout_rate, name="fm")(
            emb_inputs, training=training
        )  # (B, E)
        fm_out = jnp.sum(fm_second, axis=1, keepdims=True) + jnp.sum(
            fm_first, axis=1, keepdims=True
        )
        deep_in = emb_inputs.reshape(b, -1)
        deep_out = MultilayerPerceptionLayer(
            output_size=1,
            layer_sizes=self.deep_layer_sizes,
            dropout_rate=self.deep_dropout_rate,
            activation=self.activation,
            name="deep",
        )(deep_in, training=training)
        return deep_out + fm_out
