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

from torecsys_tpu.ops.sparse import sort_slot_grads, use_sparse_embedding_grads
from torecsys_tpu.train.pipeline import Pipeline
from torecsys_tpu.train.sparse import (
    is_hybrid_opt_state,
    merge_params,
    probe_perturbations,
    sown_aux,
    sown_ids,
    split_params,
    table_path_for,
)
from torecsys_tpu.train.state import TrainState
from flax import traverse_util

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
            pos_s = pos_out.reshape(b, 1)
            neg_s = neg_out.reshape(b, pipeline.num_negs)
            if getattr(criterion, "groupwise", False):
                # Groupwise (ListNet) path: each anchor's [pos | negs]
                # scores form one list with one-hot relevance (reference
                # groupwise_ranking_loss.py:20-59 consumes (y_true, y_pred)
                # lists; the miner supplies the in-batch lists).
                scores = jnp.concatenate([pos_s, neg_s], axis=1)
                relevance = jnp.concatenate(
                    [jnp.ones_like(pos_s), jnp.zeros_like(neg_s)], axis=1
                )
                loss = criterion(relevance, scores)
            else:
                loss = criterion(pos_s, neg_s)
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

    def dense_train_step(state: TrainState, batch: Batch):
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

    def sparse_train_step(state: TrainState, batch: Batch):
        """CTR step with touched-rows-only embedding updates (train.sparse).

        Gradients are taken w.r.t. (dense params, per-slot lookup
        perturbations); the embedding tables never receive a dense ``(V, E)``
        cotangent.  Each table's slot grads are dedup/segment-summed by row id
        and applied by the pipeline's row-wise optimizer; dense params go
        through the configured optax transform.
        """
        row_tx = pipeline.row_optimizer()
        if row_tx is None:
            raise ValueError(
                "TrainState has hybrid (sparse) optimizer state but the "
                "pipeline's optimizer has no row-wise formulation"
            )
        step_rng = jax.random.fold_in(state.rng, state.step)
        rngs = {"dropout": jax.random.fold_in(step_rng, 1)}
        features, targets = _split_batch(batch, pipeline)

        pert_shapes = probe_perturbations(seq, state.params, features)
        table_paths = {table_path_for(p) for p in pert_shapes}
        if regularizer is not None and any(
            getattr(regularizer, "key_filter", "kernel") in tp
            for tp in table_paths
        ):
            # In sparse mode the tables are closed-over constants inside the
            # loss, so a regularizer whose key_filter matches them would
            # contribute ZERO gradient to the tables here but a full gradient
            # in dense mode — a silent semantic divergence. Refuse loudly.
            raise ValueError(
                f"Regularizer(key_filter={regularizer.key_filter!r}) matches "
                f"sparse embedding tables {sorted(table_paths)}; their "
                "penalty gradient cannot flow on the touched-rows path. "
                "Use AdamW-style decoupled weight_decay (applied per touched "
                "row by the row optimizer) or set "
                "Pipeline.sparse_embeddings=False."
            )
        dense_params, tables = split_params(state.params, table_paths)
        pert_zeros = {p: jnp.zeros(s.shape, s.dtype) for p, s in pert_shapes.items()}

        def sparse_loss_fn(dense_flat, pert_flat):
            params = merge_params(dense_flat, tables)
            variables = {
                "params": params,
                "perturbations": traverse_util.unflatten_dict(pert_flat, sep="/"),
            }
            mutable = ["lookup_ids", "lookup_aux"]
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable.append("batch_stats")
            # The context is read at trace time by the input modules; entering
            # it here makes the sparse step self-contained (correct regardless
            # of the caller's contexts — Trainer, bench, or __graft_entry__).
            with use_sparse_embedding_grads():
                preds, mut = seq.apply(
                    variables, features, training=True, rngs=rngs, mutable=mutable
                )
            loss = criterion(preds, targets)
            if regularizer is not None:
                # key_filter='kernel' params are all dense; tables are
                # (correctly) outside the differentiated set here.
                loss = loss + regularizer(params)
            return loss, (mut.get("batch_stats", state.batch_stats), mut)

        (loss, (new_stats, mut)), (dense_g, pert_g) = jax.value_and_grad(
            sparse_loss_fn, argnums=(0, 1), has_aux=True
        )(dense_params, pert_zeros)

        updates, new_dense_opt = tx.update(
            dense_g, state.opt_state["dense"], dense_params
        )
        new_dense = optax.apply_updates(dense_params, updates)

        new_tables = {}
        new_sparse_opt = {}
        for pert_path, g in pert_g.items():
            tp = table_path_for(pert_path)
            table = tables[tp]
            e = g.shape[-1]
            aux = sown_aux(mut, pert_path)
            if aux is not None:
                # TRUSTED presorted route: the input pipeline attached this
                # stream's sort order / segment ids / compact unique rows
                # (data.presort, overlapped with device steps) — the device
                # skips its sort, prefix-scan, uid scatter and valid-count
                # passes.  Measured on v5e (SPEED.md r5).
                new_tables[tp], new_sparse_opt[tp] = row_tx.update_from_host_aux(
                    table, state.opt_state["sparse"][tp], g.reshape(-1, e),
                    aux, state.step,
                )
                continue
            # Sort the per-slot grads by row id, then hand the sorted stream
            # to the row optimizer: on TPU the dedup (one-hot widen + segment
            # combine) and the touched-row RMW update run fused in ONE Pallas
            # kernel pass (ops/pallas/sparse_update.fused_sorted_dedup_update);
            # off-TPU it falls back to the XLA combine.  See SPEED.md.
            ids = sown_ids(mut, pert_path)
            b = ids.shape[0]
            sorted_ids, g_sorted = sort_slot_grads(
                ids.reshape(b, -1), g.reshape(b, -1, e)
            )
            new_tables[tp], new_sparse_opt[tp] = row_tx.update_sorted(
                table, state.opt_state["sparse"][tp], sorted_ids, g_sorted,
                state.step,
            )

        new_state = state.replace(
            params=merge_params(new_dense, new_tables),
            batch_stats=new_stats,
            opt_state={"dense": new_dense_opt, "sparse": new_sparse_opt},
            step=state.step + 1,
            loss_sum=state.loss_sum + loss,
            loss_count=state.loss_count + 1.0,
        )
        return new_state, {"loss": loss}

    def train_step(state: TrainState, batch: Batch):
        # Trace-time dispatch: the state's optimizer-state layout (chosen at
        # TrainState.create) selects the dense or hybrid-sparse step.
        if is_hybrid_opt_state(state.opt_state):
            if objective != "ctr":
                raise ValueError(
                    "sparse embedding optimization currently supports the "
                    f"'ctr' objective only, got {objective!r}"
                )
            return sparse_train_step(state, batch)
        return dense_train_step(state, batch)

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


def make_eval_ranking_step(pipeline: Pipeline, ndcg):
    """Ranking eval step for the ltr/emb objectives: mine per-anchor
    ``[pos | negs]`` candidate lists with a *deterministic* key, score them,
    and accumulate streaming NDCG@k (one-hot relevance: rank-1 = the true
    target beat every sampled negative).

    ``(state, batch, eval_seed, ndcg_state) → ndcg_state`` — everything
    in-device, nothing crosses the host boundary until ``compute``.
    """
    seq = pipeline.sequential

    def step(state: TrainState, batch: Batch, eval_seed, ndcg_state):
        features, _ = _split_batch(batch, pipeline)
        key = jax.random.PRNGKey(0)
        key = jax.random.fold_in(key, eval_seed)
        pos_b, neg_b = pipeline.miner(key, features, pipeline.miner_target_field)
        variables = state.variables()
        pos_out = seq.apply(variables, pos_b, training=False)
        neg_out = seq.apply(variables, neg_b, training=False)
        b = pos_out.shape[0]
        scores = jnp.concatenate(
            [pos_out.reshape(b, 1), neg_out.reshape(b, pipeline.num_negs)], axis=1
        )
        relevance = jnp.concatenate(
            [jnp.ones((b, 1)), jnp.zeros((b, pipeline.num_negs))], axis=1
        )
        return ndcg.update(ndcg_state, scores, relevance)

    return step


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
