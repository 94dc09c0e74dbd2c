"""Sharded embedding lookup.

The north-star distributed component (SURVEY.md §2.11 / §7 hard part #1):
embedding tables row-sharded over the ``table`` mesh axis, batches sharded
over ``data``, lookup = a ``shard_map`` collective in which every table shard
contributes the rows it owns and the results are summed over ``table``.

Why contribute-and-psum (vs explicit all-to-all of unique ids): it is a single
dense collective XLA can overlap with compute, it is differentiable for free
(the transpose is the scatter-add of gradients into the owning shard), and for
recsys embedding dims (E ≤ 64) the psum payload ``(B/dp, K, E)`` rides ICI
well under the v5e bandwidth budget. An explicit unique-id all-to-all path is
the planned optimization behind the same signature.

Activation: input modules call :func:`maybe_sharded_lookup`; inside a
``with use_sharded_lookup(mesh):`` block (entered before jit-tracing the train
step) lookups route through :func:`sharded_lookup`, otherwise they compile to
one plain XLA gather.
"""

from __future__ import annotations

import contextlib
import dataclasses
import threading
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from torecsys_tpu.parallel.mesh import DATA_AXIS, TABLE_AXIS


@dataclasses.dataclass(frozen=True)
class LookupContext:
    """Configuration for sharded lookups (mesh + axis names + strategy)."""

    mesh: jax.sharding.Mesh
    data_axis: str = DATA_AXIS
    table_axis: str = TABLE_AXIS
    # Tables smaller than this many (stored) rows take the plain-gather path:
    # placement replicates them (parallel.sharding table-wise strategy), so
    # routing them through the contribute-and-psum collective would add psum
    # traffic for nothing.  MUST match the placement threshold — both default
    # to sharding.DEFAULT_MIN_ROWS_TO_SHARD; tests/dry runs with tiny tables
    # pass 0 to force the collective path.
    min_rows_to_shard: int = None  # resolved in __post_init__

    def __post_init__(self):
        if self.min_rows_to_shard is None:
            from torecsys_tpu.parallel.sharding import DEFAULT_MIN_ROWS_TO_SHARD

            object.__setattr__(
                self, "min_rows_to_shard", DEFAULT_MIN_ROWS_TO_SHARD
            )


_state = threading.local()


def _context() -> Optional[LookupContext]:
    return getattr(_state, "ctx", None)


@contextlib.contextmanager
def use_sharded_lookup(mesh: jax.sharding.Mesh, **kwargs):
    """Route all embedding lookups traced inside this block through the
    sharded path. Enter this context *around jit tracing* of the train step —
    the choice is baked into the compiled program."""
    prev = _context()
    _state.ctx = LookupContext(mesh=mesh, **kwargs)
    try:
        yield _state.ctx
    finally:
        _state.ctx = prev


def maybe_sharded_lookup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """``table[ids]`` — sharded when a :func:`use_sharded_lookup` context is
    active and the table axis exists in the mesh, plain gather otherwise.

    Args:
        table: ``(V, E)``.
        ids: integer array ``(B, ...)`` of already-offset row ids.

    Returns:
        ``(B, ..., E)``.
    """
    ctx = _context()
    if ctx is None:
        return jnp.take(table, ids, axis=0)
    if ctx.table_axis not in ctx.mesh.axis_names:
        return jnp.take(table, ids, axis=0)
    if ctx.mesh.shape[ctx.table_axis] == 1 and ctx.mesh.shape.get(ctx.data_axis, 1) == 1:
        return jnp.take(table, ids, axis=0)
    if table.shape[0] < ctx.min_rows_to_shard:
        return jnp.take(table, ids, axis=0)
    return sharded_lookup(table, ids, ctx)


def maybe_sharded_packed_lookup(
    packed_table: jnp.ndarray, ids: jnp.ndarray, embed_size: int
) -> jnp.ndarray:
    """Packed-layout ``logical_table[ids]`` — sharded when a
    :func:`use_sharded_lookup` context is active, plain otherwise.

    Args:
        packed_table: ``(ceil(V/P), P*E)``
            (``torecsys_tpu.ops.embedding.pack_table`` layout).
        ids: integer ``(B, ...)`` of already-offset logical row ids.
        embed_size: E.

    Returns:
        ``(B, ..., E)``.
    """
    from torecsys_tpu.ops.embedding import packed_lookup

    ctx = _context()
    if (
        ctx is None
        or ctx.table_axis not in ctx.mesh.axis_names
        or (
            ctx.mesh.shape[ctx.table_axis] == 1
            and ctx.mesh.shape.get(ctx.data_axis, 1) == 1
        )
        or packed_table.shape[0] < ctx.min_rows_to_shard
    ):
        return packed_lookup(packed_table, ids, embed_size)
    return sharded_packed_lookup(packed_table, ids, embed_size, ctx)


def sharded_packed_lookup(
    packed_table: jnp.ndarray,
    ids: jnp.ndarray,
    embed_size: int,
    ctx: LookupContext,
) -> jnp.ndarray:
    """Row-sharded packed lookup: contribute-and-psum over ``table``.

    Same collective layout as :func:`sharded_lookup`, but each shard decodes
    the in-row slot *before* the psum, so the ICI payload is ``(B/dp, K, E)``
    — identical to the unpacked path — while local gathers enjoy the packed
    lane-width transactions.
    """
    mesh = ctx.mesh
    ts = mesh.shape[ctx.table_axis]
    pack = packed_table.shape[1] // embed_size

    orig_shape = ids.shape
    b = orig_shape[0]
    flat_ids = ids.reshape(b, -1)
    hi = flat_ids // pack
    lo = flat_ids % pack

    vp = packed_table.shape[0]
    pad = (-vp) % ts
    if pad:
        packed_table = jnp.pad(packed_table, ((0, pad), (0, 0)))

    def _local(shard: jnp.ndarray, hi_l: jnp.ndarray, lo_l: jnp.ndarray):
        shard_rows = shard.shape[0]
        base = jax.lax.axis_index(ctx.table_axis) * shard_rows
        local = hi_l - base
        ok = (local >= 0) & (local < shard_rows)
        wide = jnp.take(shard, jnp.where(ok, local, 0), axis=0)
        wide = wide.reshape(*hi_l.shape, pack, embed_size)
        oh = jax.nn.one_hot(lo_l, pack, dtype=shard.dtype)
        rows = jnp.einsum("...p,...pe->...e", oh, wide)
        rows = jnp.where(ok[..., None], rows, jnp.zeros((), dtype=rows.dtype))
        return jax.lax.psum(rows, ctx.table_axis)

    out = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(ctx.table_axis, None), P(ctx.data_axis, None), P(ctx.data_axis, None)),
        out_specs=P(ctx.data_axis, None, None),
    )(packed_table, hi, lo)
    return out.reshape(*orig_shape, embed_size)


def sharded_lookup(table: jnp.ndarray, ids: jnp.ndarray, ctx: LookupContext) -> jnp.ndarray:
    """Row-sharded lookup via shard_map contribute-and-psum.

    Args:
        table: ``(V, E)`` global view; sharded ``P(table_axis, None)``.
        ids: ``(B, K)`` (or any ``(B, ...)``) global row ids; sharded
            ``P(data_axis, None)``.
        ctx: active :class:`LookupContext`.

    Returns:
        ``(B, ..., E)`` sharded ``P(data_axis, ...)``.
    """
    mesh = ctx.mesh
    ts = mesh.shape[ctx.table_axis]

    orig_shape = ids.shape
    b = orig_shape[0]
    flat_ids = ids.reshape(b, -1)

    v = table.shape[0]
    pad = (-v) % ts
    if pad:
        table = jnp.pad(table, ((0, pad), (0, 0)))

    def _local(table_shard: jnp.ndarray, ids_local: jnp.ndarray) -> jnp.ndarray:
        shard_rows = table_shard.shape[0]
        lo = jax.lax.axis_index(ctx.table_axis) * shard_rows
        local = ids_local - lo
        ok = (local >= 0) & (local < shard_rows)
        rows = jnp.take(table_shard, jnp.where(ok, local, 0), axis=0)
        rows = jnp.where(ok[..., None], rows, jnp.zeros((), dtype=rows.dtype))
        return jax.lax.psum(rows, ctx.table_axis)

    out = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(ctx.table_axis, None), P(ctx.data_axis, None)),
        out_specs=P(ctx.data_axis, None, None),
    )(table, flat_ids)
    return out.reshape(*orig_shape, table.shape[1])
