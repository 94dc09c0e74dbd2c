"""Jitted train / eval step factories.

The whole step — embedding lookup, interaction math, loss, regularizer,
gradients, optimizer update — is ONE jitted function with the state donated
(SURVEY.md §7: "One ``@jit`` train step with ``donate_argnums``").  Objectives:

* ``ctr``: ``loss = criterion(model(batch), batch[target])``
  (reference ``training_step`` CTR path, ``torecsys_pipeline.py:620-649``)
* ``ltr``: miner splits the batch into positive / negative views, the model
  scores both, ``loss = criterion(pos_scores, neg_scores)``
  (``torecsys_pipeline.py:732-758`` — the reference's assembly is unfinished;
  the intended behavior per ``LearningToRankWrapper`` + pairwise losses is
  implemented)
* ``emb``: aggregated [pos | negs] blocks per anchor scored in one pass, then
  split (the StarSpace layout, ``models/emb/starspace.py:96-135``)

Mining runs *inside* the jitted step from a per-step folded PRNG key — no
host round-trip per batch.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from torecsys_tpu.train.pipeline import Pipeline
from torecsys_tpu.train.state import TrainState

Batch = Dict[str, jnp.ndarray]


def interleave_pos_neg(pos: Batch, neg: Batch, num_negs: int) -> Batch:
    """Build the aggregated ``(B·(1+k), ...)`` batch with per-anchor blocks
    ``[pos_i, neg_i1, ..., neg_ik]`` — the layout StarSpace-style models
    reshape on."""
    out = {}
    for name, p in pos.items():
        n = neg[name]
        b = p.shape[0]
        tail = p.shape[1:]
        blocks = jnp.concatenate(
            [p.reshape(b, 1, *tail), n.reshape(b, num_negs, *tail)], axis=1
        )
        out[name] = blocks.reshape(b * (1 + num_negs), *tail)
    return out


def _split_batch(batch: Batch, pipeline: Pipeline) -> Tuple[Batch, Optional[jnp.ndarray]]:
    """Pop the target field(s) off the batch (reference ``_parse_batch:687``)."""
    targets = batch.get(pipeline.target_fields)
    features = {k: v for k, v in batch.items() if k != pipeline.target_fields}
    return features, targets


def make_train_step(pipeline: Pipeline) -> Callable[[TrainState, Batch], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the (un-jitted) train step for ``pipeline``; caller jits it with
    the sharding/donation policy it wants."""
    seq = pipeline.sequential
    criterion = pipeline.criterion
    regularizer = pipeline.regularizer
    tx = pipeline.optimizer
    objective = pipeline.objective

    def apply_model(params, batch_stats, batch, rngs):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
            preds, updated = seq.apply(
                variables, batch, training=True, rngs=rngs, mutable=["batch_stats"]
            )
            return preds, updated.get("batch_stats", batch_stats)
        preds = seq.apply(variables, batch, training=True, rngs=rngs)
        return preds, batch_stats

    def loss_fn(params, state: TrainState, batch: Batch, step_rng):
        rngs = {"dropout": jax.random.fold_in(step_rng, 1)}
        features, targets = _split_batch(batch, pipeline)

        if objective == "ctr":
            preds, new_stats = apply_model(params, state.batch_stats, features, rngs)
            loss = criterion(preds, targets)
        elif objective == "ltr":
            miner_rng = jax.random.fold_in(step_rng, 2)
            pos_b, neg_b = pipeline.miner(miner_rng, features, pipeline.miner_target_field)
            pos_out, new_stats = apply_model(params, state.batch_stats, pos_b, rngs)
            neg_out, new_stats = apply_model(params, new_stats, neg_b, rngs)
            b = pos_out.shape[0]
            loss = criterion(pos_out.reshape(b, 1), neg_out.reshape(b, pipeline.num_negs))
        elif objective == "emb":
            miner_rng = jax.random.fold_in(step_rng, 2)
            pos_b, neg_b = pipeline.miner(miner_rng, features, pipeline.miner_target_field)
            agg = interleave_pos_neg(pos_b, neg_b, pipeline.num_negs)
            out, new_stats = apply_model(params, state.batch_stats, agg, rngs)
            k = pipeline.num_negs
            b = out.shape[0] // (1 + k)
            scores = out.reshape(b, 1 + k)
            loss = criterion(scores[:, :1], scores[:, 1:])
        else:
            raise ValueError(f"unknown objective {objective!r}")

        if regularizer is not None:
            loss = loss + regularizer(params)
        return loss, new_stats

    def train_step(state: TrainState, batch: Batch):
        step_rng = jax.random.fold_in(state.rng, state.step)
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state, batch, step_rng
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
            # metric accumulation stays in-device (see TrainState docstring)
            loss_sum=state.loss_sum + loss,
            loss_count=state.loss_count + 1.0,
        )
        return new_state, {"loss": loss}

    return train_step


def make_train_scan(train_step):
    """Wrap a train step in a ``lax.scan`` over a stacked batch dict.

    ``stacked`` maps each field to a ``(K, B, ...)`` array — K micro-batches
    executed in ONE device dispatch. On a high-latency runtime (tunneled TPU)
    this amortizes the per-dispatch round trip; on a pod it shrinks host
    involvement to one enqueue per K steps.
    """

    def scan_steps(state: TrainState, stacked: Batch):
        def body(s, batch):
            s, logs = train_step(s, batch)
            return s, logs["loss"]

        state, losses = jax.lax.scan(body, state, stacked)
        return state, {"loss": losses[-1]}

    return scan_steps


def make_eval_step(pipeline: Pipeline, to_probability: bool = True):
    """Build the eval step: ``(state, batch) → (scores, targets)``.

    ``to_probability`` applies a sigmoid to raw-score models (models that
    already emit probabilities set ``outputs_probability = True``; AUC is
    invariant either way, logloss is not).
    """
    seq = pipeline.sequential
    model_emits_prob = bool(getattr(pipeline.model, "outputs_probability", False))

    def eval_step(state: TrainState, batch: Batch):
        features, targets = _split_batch(batch, pipeline)
        preds = seq.apply(state.variables(), features, training=False)
        if to_probability and not model_emits_prob:
            preds = jax.nn.sigmoid(preds)
        return preds, targets

    return eval_step


def make_eval_metrics_step(pipeline: Pipeline, auc, logloss):
    """Eval step with in-device streaming-metric accumulation.

    ``(state, batch, auc_state, ll_state) → (auc_state, ll_state)`` — one
    fused dispatch per eval batch (metric updates inside jit, nothing
    crosses the host boundary until ``compute``).
    """
    eval_step = make_eval_step(pipeline, to_probability=True)

    def step(state: TrainState, batch: Batch, auc_state, ll_state):
        preds, targets = eval_step(state, batch)
        auc_state = auc.update(auc_state, preds, targets)
        ll_state = logloss.update(ll_state, preds, targets)
        return auc_state, ll_state

    return step
