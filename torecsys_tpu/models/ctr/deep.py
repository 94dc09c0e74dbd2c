"""Deep-interaction CTR models: PNN, DCN, xDeepFM, NCF, Wide&Deep.

Parity (composition per the reference forwards):
* PNN     — ``/root/reference/torecsys/models/ctr/product_neural_network.py:11-124``
* DCN     — ``models/ctr/deep_and_cross_network.py:10-98``
* xDeepFM — ``models/ctr/xdeep_fm.py:10-124``
* NCF     — ``models/ctr/neural_collaborative_filtering.py:10-85``
* W&D     — ``models/ctr/wide_and_deep.py:10-108``
"""

from __future__ import annotations

from typing import Callable, Tuple

import flax.linen as nn

from torecsys_tpu.layers.precision import Dense as pdense
import jax.numpy as jnp

from torecsys_tpu.layers.ctr import (
    CompressInteractionNetworkLayer,
    CrossNetworkLayer,
    InnerProductNetworkLayer,
    MultilayerPerceptionLayer,
    OuterProductNetworkLayer,
    WideLayer,
)
from torecsys_tpu.layers.emb import GeneralizedMatrixFactorizationLayer
from torecsys_tpu.models.base import CtrBaseModel, register_model


@register_model("PNN", "ProductNeuralNetwork")
class ProductNeuralNetworkModel(CtrBaseModel):
    """concat(product interactions, first-order[, bias]) → DNN → ``(B, 1)``.

    ``prod_method``: ``'inner' | 'outer'``.
    """

    num_fields: int
    embed_size: int
    deep_layer_sizes: Tuple[int, ...] = (64, 64)
    prod_method: str = "inner"
    kernel_type: str = "mat"
    use_bias: bool = True
    deep_dropout_rate: float = 0.0
    activation: Callable[[jnp.ndarray], jnp.ndarray] = nn.relu

    @nn.compact
    def __call__(self, feat_inputs: jnp.ndarray, emb_inputs: jnp.ndarray,
                 training: bool = False) -> jnp.ndarray:
        b = feat_inputs.shape[0]
        if self.prod_method == "inner":
            prod = InnerProductNetworkLayer(name="pnn")(emb_inputs, training=training)
        elif self.prod_method == "outer":
            prod = OuterProductNetworkLayer(
                num_fields=self.num_fields,
                embed_size=self.embed_size,
                kernel_type=self.kernel_type,
                name="pnn",
            )(emb_inputs, training=training)
        else:
            raise ValueError(f"unknown prod_method {self.prod_method!r}")
        first = feat_inputs.reshape(b, -1)  # (B, N)
        parts = [prod, first]
        if self.use_bias:
            bias = self.param("bias", nn.initializers.uniform(scale=1.0), (1, 1))
            parts.append(jnp.broadcast_to(bias, (b, 1)))
        cat = jnp.concatenate(parts, axis=1)
        return MultilayerPerceptionLayer(
            output_size=1,
            layer_sizes=self.deep_layer_sizes,
            dropout_rate=self.deep_dropout_rate,
            activation=self.activation,
            name="deep",
        )(cat, training=training)


@register_model("DCN", "DeepAndCrossNetwork")
class DeepAndCrossNetworkModel(CtrBaseModel):
    """Cross network ∥ deep tower → concat → linear head → ``(B, 1)``."""

    cross_num_layers: int = 3
    deep_output_size: int = 16
    deep_layer_sizes: Tuple[int, ...] = (64, 64)
    output_size: int = 1
    deep_dropout_rate: float = 0.0
    activation: Callable[[jnp.ndarray], jnp.ndarray] = nn.relu

    @nn.compact
    def __call__(self, emb_inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        b = emb_inputs.shape[0]
        cross_out = CrossNetworkLayer(num_layers=self.cross_num_layers, name="cross")(
            emb_inputs, training=training
        )  # (B, N, E)
        deep_out = MultilayerPerceptionLayer(
            output_size=self.deep_output_size,
            layer_sizes=self.deep_layer_sizes,
            dropout_rate=self.deep_dropout_rate,
            activation=self.activation,
            name="deep",
        )(emb_inputs, training=training)  # (B, N, O)
        cat = jnp.concatenate([cross_out, deep_out], axis=2).reshape(b, -1)
        return pdense(self.output_size, name="fc")(cat)


@register_model("XDeepFM", "xDeepFM")
class XDeepFactorizationMachineModel(CtrBaseModel):
    """first-order + CIN + DNN + bias → ``(B, 1)``."""

    embed_size: int
    num_fields: int
    cin_layer_sizes: Tuple[int, ...] = (128, 128)
    deep_layer_sizes: Tuple[int, ...] = (64, 64)
    cin_is_direct: bool = False
    use_bias: bool = True
    use_batchnorm: bool = True
    deep_dropout_rate: float = 0.0
    activation: Callable[[jnp.ndarray], jnp.ndarray] = nn.relu

    @nn.compact
    def __call__(self, feat_inputs: jnp.ndarray, emb_inputs: jnp.ndarray,
                 training: bool = False) -> jnp.ndarray:
        b = feat_inputs.shape[0]
        cin_out = CompressInteractionNetworkLayer(
            embed_size=self.embed_size,
            num_fields=self.num_fields,
            output_size=1,
            layer_sizes=self.cin_layer_sizes,
            is_direct=self.cin_is_direct,
            use_batchnorm=self.use_batchnorm,
            activation=self.activation,
            name="cin",
        )(emb_inputs, training=training)  # (B, 1)
        deep_out = MultilayerPerceptionLayer(
            output_size=1,
            layer_sizes=self.deep_layer_sizes,
            dropout_rate=self.deep_dropout_rate,
            activation=self.activation,
            name="deep",
        )(emb_inputs.reshape(b, -1), training=training)
        feat_out = jnp.sum(feat_inputs, axis=1)  # (B, 1)
        out = feat_out + cin_out + deep_out
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (1, 1))
            out = out + bias
        return out


@register_model("NCF", "NeuralCollaborativeFiltering")
class NeuralCollaborativeFilteringModel(CtrBaseModel):
    """GMF + deep tower over (user, item) embeddings → ``(B, 1)``.

    ``emb_inputs`` is ``(B, 2, E)`` (user and item rows).
    """

    deep_layer_sizes: Tuple[int, ...] = (64, 64)
    deep_dropout_rate: float = 0.0
    activation: Callable[[jnp.ndarray], jnp.ndarray] = nn.relu

    @nn.compact
    def __call__(self, emb_inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        b = emb_inputs.shape[0]
        deep_out = MultilayerPerceptionLayer(
            output_size=1,
            layer_sizes=self.deep_layer_sizes,
            dropout_rate=self.deep_dropout_rate,
            activation=self.activation,
            name="deep",
        )(emb_inputs.reshape(b, -1), training=training)
        glm_out = GeneralizedMatrixFactorizationLayer(name="glm")(
            emb_inputs, training=training
        )
        return glm_out + deep_out


@register_model("WideAndDeep")
class WideAndDeepModel(CtrBaseModel):
    """Wide(first-order) ∥ per-field deep → concat → output linear → ``(B, 1)``."""

    deep_layer_sizes: Tuple[int, ...] = (64, 64)
    wide_dropout_rate: float = 0.0
    deep_dropout_rate: float = 0.0
    out_dropout_rate: float = 0.0
    activation: Callable[[jnp.ndarray], jnp.ndarray] = nn.relu

    @nn.compact
    def __call__(self, feat_inputs: jnp.ndarray, emb_inputs: jnp.ndarray,
                 training: bool = False) -> jnp.ndarray:
        b = feat_inputs.shape[0]
        wide_out = WideLayer(
            output_size=1, dropout_rate=self.wide_dropout_rate, name="wide"
        )(feat_inputs.reshape(b, -1), training=training)  # (B, 1)
        deep_out = MultilayerPerceptionLayer(
            output_size=1,
            layer_sizes=self.deep_layer_sizes,
            dropout_rate=self.deep_dropout_rate,
            activation=self.activation,
            name="deep",
        )(emb_inputs, training=training)  # (B, N, 1)
        deep_out = deep_out[..., 0]  # (B, N)
        cat = jnp.concatenate([wide_out, deep_out], axis=1)  # (B, N+1)
        return WideLayer(
            output_size=1, dropout_rate=self.out_dropout_rate, name="output"
        )(cat, training=training)
