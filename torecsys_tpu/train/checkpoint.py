"""Checkpoint / resume: save and restore the full train state.

The reference plans but never implements checkpointing (``build`` accepts a
``load_from`` config whose ``trainer.load`` target does not exist —
``torecsys_pipeline.py:897-898``, SURVEY.md §5.4).  Here it is real: the whole
:class:`TrainState` (params, batch_stats, optimizer state, step, rng) is
serialised with flax msgpack.  Sharded arrays are gathered to host on save and
re-placed by the caller's sharding rules on restore (re-placement happens
naturally when the restored state enters the jitted step).
"""

from __future__ import annotations

import os
from typing import Optional

import flax.serialization
import jax

from torecsys_tpu.train.state import TrainState


def save_checkpoint(path: str, state: TrainState) -> str:
    """Serialise ``state`` to ``path`` (msgpack).  Returns the path."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_state = jax.device_get(state)
    data = flax.serialization.to_bytes(host_state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore a state saved by :func:`save_checkpoint`.

    ``template`` supplies the pytree structure (build it exactly as for a
    fresh run — same model / optimizer — then restore over it).

    Note: toggling ``Pipeline.sparse_embeddings`` changes the optimizer-state
    layout (optax namedtuples vs the hybrid ``{'dense','sparse'}`` dict), so a
    checkpoint saved under one setting cannot restore under the other — this
    raises with a pointer at the flag instead of a bare structure error.
    """
    with open(path, "rb") as f:
        data = f.read()
    try:
        return flax.serialization.from_bytes(template, data)
    except (KeyError, ValueError, TypeError) as e:
        # Diagnose a layout mismatch from the deserialized STRUCTURE, not a
        # raw-byte substring scan (a param named "...sparse..." would
        # mislabel an unrelated failure): the hybrid optimizer state is a
        # dict with a top-level 'sparse' key under 'opt_state'.
        try:
            raw = flax.serialization.msgpack_restore(data)
            saved_opt = raw.get("opt_state", {})
            saved_hybrid = isinstance(saved_opt, dict) and "sparse" in saved_opt
        except Exception:
            raise e from None
        tmpl_hybrid = (
            isinstance(template.opt_state, dict) and "sparse" in template.opt_state
        )
        if saved_hybrid != tmpl_hybrid:
            raise ValueError(
                f"checkpoint {path!r} was saved with sparse_embeddings="
                f"{saved_hybrid} but the pipeline is configured with "
                f"sparse_embeddings={tmpl_hybrid}; the optimizer-state layouts "
                "are incompatible — set Pipeline.sparse_embeddings to match "
                "the checkpoint (or retrain)"
            ) from e
        raise


def latest_checkpoint(directory: str, prefix: str = "ckpt_") -> Optional[str]:
    """Path of the newest ``{prefix}{step}.msgpack`` in ``directory``."""
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for name in os.listdir(directory):
        if name.startswith(prefix) and name.endswith(".msgpack"):
            try:
                step = int(name[len(prefix):].split(".")[0])
            except ValueError:
                continue
            if step > best_step:
                best, best_step = os.path.join(directory, name), step
    return best
