"""Multi-task / mixture-of-experts / matching CTR models: DeepMoE, MMoE,
ESMM, ESM², DeepMCP.

Parity:
* DeepMoE — ``/root/reference/torecsys/models/ctr/deep_moe.py:10-92``
* MMoE    — ``models/ctr/multigate_moe.py:10-116``
* ESMM    — ``models/ctr/entire_space_multi_task.py:10-82``
* ESM²    — ``models/ctr/elaborated_entire_space_supervised_multi_task.py:10-124``
* DeepMCP — ``models/ctr/deep_mcp.py:10-194``

Probability-head note: ESMM/ESM² in the reference compose *raw* DNN outputs
as if they were probabilities (no sigmoid — a quirk); here each head passes
through a sigmoid so the probability-graph composition
(``prob_click_d_action_buy = p₁·p₂`` etc.) is mathematically sound.  Parity
is judged on intended math per SURVEY.md §7.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import flax.linen as nn
import jax.numpy as jnp

from torecsys_tpu.layers.ctr import (
    MixtureOfExpertsLayer,
    MultilayerPerceptionLayer,
)
from torecsys_tpu.models.base import CtrBaseModel, register_model


class _FlatMLPExpert(nn.Module):
    """Expert: DNN over flattened ``(B, N·E)`` features → ``(B, O)``."""

    output_size: int
    layer_sizes: Tuple[int, ...]
    dropout_rate: float = 0.0
    activation: Callable[[jnp.ndarray], jnp.ndarray] = nn.relu

    @nn.compact
    def __call__(self, emb_inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        b = emb_inputs.shape[0]
        return MultilayerPerceptionLayer(
            output_size=self.output_size,
            layer_sizes=self.layer_sizes,
            dropout_rate=self.dropout_rate,
            activation=self.activation,
        )(emb_inputs.reshape(b, -1), training=training)


@register_model("DeepMoE", "DeepMixtureOfExperts")
class DeepMixtureOfExpertsModel(CtrBaseModel):
    """Stacked MoE layers (experts = DNNs) → Σ → ``(B, num_gates)``."""

    num_moe_layers: int = 1
    num_experts: int = 4
    num_gates: int = 1
    expert_output_size: int = 16
    expert_layer_sizes: Tuple[int, ...] = (32,)
    deep_dropout_rate: float = 0.0
    activation: Callable[[jnp.ndarray], jnp.ndarray] = nn.relu

    @nn.compact
    def __call__(self, emb_inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        x = emb_inputs
        for i in range(self.num_moe_layers):
            factory = functools.partial(
                _FlatMLPExpert,
                output_size=self.expert_output_size,
                layer_sizes=self.expert_layer_sizes,
                dropout_rate=self.deep_dropout_rate,
                activation=self.activation,
            )
            # (B, G, K·O) — the gated-expert map is the next layer's
            # (fields=G, embed=K·O) input, matching the reference's O→E rename
            # (deep_moe.py:forward).
            x = MixtureOfExpertsLayer(
                expert_factory=factory,
                num_experts=self.num_experts,
                num_gates=self.num_gates,
                name=f"moe_{i}",
            )(x, training=training)
        return jnp.sum(x, axis=2)  # (B, num_gates)


@register_model("MMoE", "MultiGateMixtureOfExperts")
class MultiGateMixtureOfExpertsModel(CtrBaseModel):
    """MoE with one gate per task → per-task tower DNNs → ``(B, num_tasks)``."""

    num_tasks: int
    num_experts: int = 4
    expert_output_size: int = 16
    expert_layer_sizes: Tuple[int, ...] = (32,)
    tower_layer_sizes: Tuple[int, ...] = (16,)
    deep_dropout_rate: float = 0.0
    activation: Callable[[jnp.ndarray], jnp.ndarray] = nn.relu

    @nn.compact
    def __call__(self, emb_inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        factory = functools.partial(
            _FlatMLPExpert,
            output_size=self.expert_output_size,
            layer_sizes=self.expert_layer_sizes,
            dropout_rate=self.deep_dropout_rate,
            activation=self.activation,
        )
        moe_out = MixtureOfExpertsLayer(
            expert_factory=factory,
            num_experts=self.num_experts,
            num_gates=self.num_tasks,
            name="moe",
        )(emb_inputs, training=training)  # (B, T, K·O)
        towers = []
        for t in range(self.num_tasks):
            tower = MultilayerPerceptionLayer(
                output_size=1,
                layer_sizes=self.tower_layer_sizes,
                dropout_rate=self.deep_dropout_rate,
                activation=self.activation,
                name=f"tower_{t}",
            )(moe_out[:, t, :], training=training)  # (B, 1)
            towers.append(tower)
        return jnp.concatenate(towers, axis=1)  # (B, T)


@register_model("ESMM", "EntireSpaceMultiTask")
class EntireSpaceMultiTaskModel(CtrBaseModel):
    """Two heads over field-pooled embeddings → ``(pCVR, pCTR)`` each ``(B, 1)``."""

    deep_layer_sizes: Tuple[int, ...] = (64, 64)
    deep_dropout_rate: float = 0.0
    activation: Callable[[jnp.ndarray], jnp.ndarray] = nn.relu
    outputs_probability = True

    def _head(self, name: str, pooled: jnp.ndarray, training: bool) -> jnp.ndarray:
        out = MultilayerPerceptionLayer(
            output_size=1,
            layer_sizes=self.deep_layer_sizes,
            dropout_rate=self.deep_dropout_rate,
            activation=self.activation,
            name=name,
        )(pooled, training=training)
        return nn.sigmoid(out)

    @nn.compact
    def __call__(self, emb_inputs: jnp.ndarray,
                 training: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        pooled = jnp.mean(emb_inputs, axis=2)  # (B, N) — AdaptiveAvgPool1d(1)
        pcvr = self._head("cvr_deep", pooled, training)
        pctr = self._head("ctr_deep", pooled, training)
        return pcvr, pctr


@register_model("ESM2", "ElaboratedEntireSpaceSupervisedMultiTask")
class ElaboratedEntireSpaceSupervisedMultiTaskModel(CtrBaseModel):
    """Four conditional-probability heads composed into the ESM² purchase
    graph → ``(p_click, p_d_action, p_buy)`` each ``(B, 1)``."""

    deep_layer_sizes: Tuple[int, ...] = (64, 64)
    deep_dropout_rate: float = 0.0
    activation: Callable[[jnp.ndarray], jnp.ndarray] = nn.relu
    outputs_probability = True

    def _head(self, name: str, pooled: jnp.ndarray, training: bool) -> jnp.ndarray:
        out = MultilayerPerceptionLayer(
            output_size=1,
            layer_sizes=self.deep_layer_sizes,
            dropout_rate=self.deep_dropout_rate,
            activation=self.activation,
            name=name,
        )(pooled, training=training)
        return nn.sigmoid(out)

    @nn.compact
    def __call__(self, emb_inputs: jnp.ndarray, training: bool = False):
        pooled = jnp.mean(emb_inputs, axis=2)  # (B, N)
        p_impress_click = self._head("impress_to_click_deep", pooled, training)
        p_click_d_action = self._head("click_to_d_action_deep", pooled, training)
        p_d_action_buy = self._head("d_action_to_buy_deep", pooled, training)
        p_o_action_buy = self._head("o_action_to_buy_deep", pooled, training)

        p_impress_d_action = p_impress_click * p_click_d_action
        p_click_d_action_buy = p_click_d_action * p_d_action_buy
        p_click_o_action_buy = (1.0 - p_click_d_action_buy) * p_o_action_buy
        p_click_buy = p_click_d_action_buy + p_click_o_action_buy
        p_impress_buy = p_impress_click * p_click_buy
        return p_impress_click, p_impress_d_action, p_impress_buy


@register_model("DeepMCP", "DeepMatchingCorrelationPrediction")
class DeepMatchingCorrelationPredictionModel(CtrBaseModel):
    """Three subnets — prediction, matching, correlation — over user/content/
    positive/negative item embeddings.

    Returns ``(y_pred, y_match, y_corr_pos, y_corr_neg)``:
      * y_pred  ``(B, 1)``: DNN over concat(user, content)
      * y_match ``(B, 1)``: tanh-towers dot product → sigmoid
      * y_corr_pos ``(B, 1)`` / y_corr_neg ``(B, Nneg)``: correlation-subnet
        dot products of content vs positive / negative items → sigmoid
    """

    pred_layer_sizes: Tuple[int, ...] = (64, 64)
    match_layer_sizes: Tuple[int, ...] = (64,)
    match_output_size: int = 16
    corr_layer_sizes: Tuple[int, ...] = (64,)
    corr_output_size: int = 16
    deep_dropout_rate: float = 0.0
    activation: Callable[[jnp.ndarray], jnp.ndarray] = nn.relu

    def _mlp(self, name, output_size, layer_sizes, x, training, final_tanh=False):
        out = MultilayerPerceptionLayer(
            output_size=output_size,
            layer_sizes=layer_sizes,
            dropout_rate=self.deep_dropout_rate,
            activation=self.activation,
            name=name,
        )(x, training=training)
        return jnp.tanh(out) if final_tanh else out

    @nn.compact
    def __call__(
        self,
        user_emb_inputs: jnp.ndarray,
        content_emb_inputs: jnp.ndarray,
        pos_emb_inputs: jnp.ndarray,
        neg_emb_inputs: jnp.ndarray,
        training: bool = False,
    ):
        b = user_emb_inputs.shape[0]
        user = user_emb_inputs.reshape(b, -1)
        content = content_emb_inputs.reshape(b, -1)
        pos = pos_emb_inputs.reshape(b, -1)
        negs = neg_emb_inputs.reshape(b, neg_emb_inputs.shape[1], -1)  # (B, K, NE)

        # prediction subnet
        y_pred = self._mlp(
            "prediction", 1, self.pred_layer_sizes,
            jnp.concatenate([user, content], axis=1), training,
        )

        # matching subnet: tanh towers, dot, sigmoid
        user_match = self._mlp("match_user", self.match_output_size,
                               self.match_layer_sizes, user, training, final_tanh=True)
        item_match = self._mlp("match_item", self.match_output_size,
                               self.match_layer_sizes, content, training, final_tanh=True)
        y_match = nn.sigmoid(jnp.sum(user_match * item_match, axis=1, keepdims=True))

        # correlation subnet: shared tower over content/pos/neg
        corr = MultilayerPerceptionLayer(
            output_size=self.corr_output_size,
            layer_sizes=self.corr_layer_sizes,
            dropout_rate=self.deep_dropout_rate,
            activation=self.activation,
            name="correlation",
        )
        content_corr = corr(content, training=training)  # (B, C)
        pos_corr = corr(pos, training=training)  # (B, C)
        neg_corr = corr(negs, training=training)  # (B, K, C)
        y_corr_pos = nn.sigmoid(jnp.sum(content_corr * pos_corr, axis=1, keepdims=True))
        y_corr_neg = nn.sigmoid(jnp.einsum("bc,bkc->bk", content_corr, neg_corr))
        return y_pred, y_match, y_corr_pos, y_corr_neg
