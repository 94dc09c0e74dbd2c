"""Sharded embedding lookup.

The north-star distributed component (SURVEY.md §2.11 / §7 hard part #1):
embedding tables row-sharded over the ``table`` mesh axis, batches sharded
over ``data``, lookup = a ``shard_map`` collective in which every table shard
contributes the rows it owns and the results are summed over ``table``.

Two collective strategies ship behind the same signature:

* ``psum`` (contribute-and-psum): a single dense collective XLA can overlap
  with compute, differentiable for free (the transpose is the scatter-add of
  gradients into the owning shard); payload ``(B/dp, K, E)`` regardless of
  duplicate ids.
* ``alltoall`` (unique-id exchange): dedup locally, send each unique id to
  its owning shard, return only the owned rows — wins when unique ids ≪
  slots (the Zipf-heavy production regime).  Measured comm-volume table in
  SPEED.md (``tools/comm_volume.py``).
* ``auto`` (default-able): picks per lookup from the calibrated byte model
  (:func:`modeled_comm_mb`).

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
    # Collective strategy: "psum" (contribute-and-psum — one dense collective,
    # payload (B/dp, K, E) regardless of duplicates), "alltoall" (unique-id
    # exchange — dedup locally, send each unique id to its owning shard,
    # return only the owned rows; wins when unique ids ≪ slots, i.e. the
    # Zipf-heavy production regime), or "auto" (pick per lookup from the
    # calibrated byte model, modeled_comm_mb).  SPEED.md has the measured
    # comm-volume table.
    strategy: str = "psum"
    # Per-destination id capacity of the all-to-all exchange, as a fraction
    # of the local slot count: capacity = ceil(factor * M_local / num_shards).
    # Worst-case correctness needs factor = num_shards (every id owned by one
    # shard); the default 2.0 covers realistic hash-distributed ids and any
    # overflow POISONS the output with NaN (loud failure) rather than
    # silently dropping lookups.
    capacity_factor: float = 2.0
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

# Auto-strategy byte model, calibrated against the compiled-HLO comm-volume
# measurements in COMM_VOLUME.json (tools/comm_volume.py --sweep: 7 shapes
# spanning E=16/64, ts=4/8, K=4/26, capacity 1..6).  Two structural facts
# fall out of the per-collective byte counts:
#
# 1. Both strategies share a factor-independent output-assembly term, and
#    psum's total exceeds it by EXACTLY one (B, K, E) activation pass:
#    at every measured shape, psum_total − alltoall_assembly equals the
#    per-device activation bytes (6.82 / 27.26 / 3.41 / 1.02 MB across the
#    sweep).  The common term therefore cancels from the decision, which
#    reduces to: alltoall wins iff its capacity-scaled exchange term is
#    smaller than one activation pass.  (The r4 model scaled BOTH totals by
#    the same payload factor, so the comparison degenerated to a constant
#    capacity threshold — r4 ADVICE low-1; this model's two terms scale
#    differently in E, ts and capacity.)
# 2. The exchange term follows the implementation's bucket shape — per
#    device, (ts, cap) id buckets plus (ts, cap, E) row and grad exchanges
#    with cap = ceil(factor · m_local / ts), i.e. ts·cap·(4 + 8E) bytes —
#    times a fitted slack _BETA for GSPMD's extra lowering passes (implied
#    betas across the sweep: 1.08–1.23 at six of seven shapes; the K=4
#    small-M shape implies 2.0 from bucket-rounding, where the decision is
#    a <3% near-tie either way — tested with that tolerance).
_BETA = 1.2


def modeled_comm_mb(strategy: str, m_slots: int, embed_size: int,
                    capacity_factor: float = 2.0, table_shards: int = 8,
                    data_shards: int = 1) -> float:
    """Modeled per-device, per-step (fwd+bwd) DIFFERENTIATING collective MB.

    The factor-independent assembly term common to both strategies is
    excluded from BOTH (it cancels in the auto decision — see the
    calibration notes above): "psum" returns its distinguishing extra
    activation all-reduce pass; "alltoall" returns its capacity-scaled
    id/row/grad exchange.  Validated against measured HLO volumes at every
    COMM_VOLUME.json shape by ``tests/test_parallel.py``.
    """
    m_dev = m_slots / max(1, data_shards)
    if strategy == "psum":
        return m_dev * embed_size * 4.0 / 1e6
    if strategy == "alltoall":
        ts = max(1, table_shards)
        m_local = m_dev / ts
        cap = max(1.0, -(-capacity_factor * m_local // ts))
        return _BETA * ts * cap * (4.0 + 8.0 * embed_size) / 1e6
    raise ValueError(f"unknown strategy {strategy!r}")


def resolve_strategy(ctx: "LookupContext", m_slots: int,
                     embed_size: int) -> str:
    """Resolve ``ctx.strategy`` ("auto" → the modeled-cheaper collective)."""
    if ctx.strategy != "auto":
        return ctx.strategy
    ts = ctx.mesh.shape.get(ctx.table_axis, 1)
    dp = ctx.mesh.shape.get(ctx.data_axis, 1)
    a2a = modeled_comm_mb("alltoall", m_slots, embed_size,
                          ctx.capacity_factor, ts, dp)
    psum = modeled_comm_mb("psum", m_slots, embed_size, table_shards=ts,
                           data_shards=dp)
    return "alltoall" if a2a < psum else "psum"


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
    if resolve_strategy(ctx, ids.size, table.shape[1]) == "alltoall":
        return sharded_lookup_alltoall(table, ids, ctx)
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
    if resolve_strategy(ctx, ids.size, embed_size) == "alltoall":
        return sharded_packed_lookup_alltoall(packed_table, ids, embed_size, ctx)
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


def _dedup_ids(flat_ids: jnp.ndarray):
    """Static-size dedup of a 1-D int stream.

    Returns ``(uids, inv, n_unique)``: ascending unique ids sentinel-padded
    with ``INT32_MAX`` to the input length, the inverse map (each input
    slot's index into ``uids``), and the unique count."""
    from torecsys_tpu.ops.sparse import prefix_sum

    m = flat_ids.shape[0]
    ids32 = flat_ids.astype(jnp.int32)
    sorted_ids, order = jax.lax.sort_key_val(ids32, jnp.arange(m, dtype=jnp.int32))
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]]
    )
    seg = prefix_sum(is_first.astype(jnp.int32)) - 1
    n_unique = seg[-1] + 1
    sentinel = jnp.iinfo(jnp.int32).max
    uids = jnp.full((m,), sentinel, jnp.int32).at[seg].set(
        sorted_ids, indices_are_sorted=True
    )
    inv = jnp.zeros((m,), jnp.int32).at[order].set(seg)
    return uids, inv, n_unique


def _alltoall_unique_rows(shard: jnp.ndarray, flat_ids: jnp.ndarray,
                          ctx: LookupContext, rows_per_shard=None,
                          gather_fn=None, out_width=None):
    """Inside shard_map: fetch the rows of ``flat_ids`` from the row-sharded
    (global) table via a unique-id all-to-all exchange.

    Steps (SURVEY.md §7 hard part #1): local static-size dedup → partition
    unique ids by owning shard (they are contiguous runs of the sorted unique
    list) → all-to-all the id buckets → each shard gathers its owned rows →
    all-to-all the rows back → re-expand to the original slots.  Autodiff
    transposes the collective pair into the correct scatter-add of gradients
    into the owning shard.

    ``rows_per_shard``/``gather_fn``/``out_width`` generalize the local
    gather: the packed path exchanges LOGICAL ids and E-float rows (the
    owner decodes its packed layout locally) so the ICI payload is one
    logical row per unique id — exchanging 128-lane stored rows instead was
    measured 8x more collective bytes at E=16 (tools/comm_volume.py).

    Returns ``(rows (M, E_row), overflow flag)`` — overflow means a
    destination bucket exceeded the static capacity; callers poison the
    output (NaN) so the failure is loud, never silent.
    """
    ts = ctx.mesh.shape[ctx.table_axis]
    shard_rows = rows_per_shard if rows_per_shard is not None else shard.shape[0]
    m = flat_ids.shape[0]
    cap = max(1, int(-(-m * ctx.capacity_factor // ts)))
    cap = min(cap, m)

    uids, inv, n_unique = _dedup_ids(flat_ids)
    valid = jnp.arange(m, dtype=jnp.int32) < n_unique
    # owner: ts for the sentinel tail, -1 for negative (slot-padding) ids —
    # both excluded from every destination's count
    owner = jnp.where(valid, jnp.where(uids >= 0, uids // shard_rows, -1), ts)
    # unique ids ascend → owners ascend → each destination's ids are one
    # contiguous run [start_d, start_d + count_d); negative-id entries sort
    # to the HEAD of the unique list, so every run is offset by their count
    counts = jnp.sum(
        owner[None, :] == jnp.arange(ts, dtype=jnp.int32)[:, None], axis=1
    )  # (ts,)
    n_neg = jnp.sum(owner == -1, dtype=jnp.int32)
    starts = n_neg + jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )
    overflow = jnp.any(counts > cap)

    # send[d, j] = uids[starts[d] + j] for j < counts[d], else local-row
    # sentinel (shard_rows → gathers a zero row on the owner)
    j = jnp.arange(cap, dtype=jnp.int32)[None, :]
    gather_idx = jnp.minimum(starts[:, None] + j, m - 1)
    send = jnp.where(
        j < counts[:, None], jnp.take(uids, gather_idx), jnp.int32(-1)
    )  # (ts, cap) global ids, -1 padding

    recv = jax.lax.all_to_all(send, ctx.table_axis, 0, 0)  # (ts, cap)
    base = jax.lax.axis_index(ctx.table_axis) * shard_rows
    local = recv - base
    ok = (local >= 0) & (local < shard_rows) & (recv >= 0)
    safe_local = jnp.where(ok, local, 0)
    if gather_fn is None:
        owned_rows = jnp.take(shard, safe_local, axis=0)
    else:
        owned_rows = gather_fn(shard, safe_local)
    owned_rows = jnp.where(ok[..., None], owned_rows, 0.0)  # (ts, cap, E)

    rows_back = jax.lax.all_to_all(owned_rows, ctx.table_axis, 0, 0)
    # unique index u lives at rows_back[owner[u], u - starts[owner[u]]]
    u = jnp.arange(m, dtype=jnp.int32)
    own_u = jnp.minimum(owner, ts - 1)
    pos_u = jnp.clip(u - jnp.take(starts, own_u), 0, cap - 1)
    rows_unique = rows_back[own_u, pos_u]  # (m, E)
    rows = jnp.take(rows_unique, inv, axis=0)
    return rows, overflow


def _slots_split_for_alltoall(ids: jnp.ndarray, ts: int):
    """Flatten + pad the slot axis so it splits evenly over the table axis.

    The slot dimension is SHARDED over ``table`` (not replicated): each
    table-axis program dedups and exchanges only its own slice of the
    lookups.  That both divides the dedup work ts-ways and keeps the
    shard_map output non-replicated, so autodiff transposes the exchange
    into exactly one gradient contribution per slot (a replicated-request
    formulation would overcount by ts).  Padding uses ``-1`` (never owned,
    never sent; its output rows are garbage and sliced away).
    """
    b = ids.shape[0]
    flat = ids.reshape(b, -1)
    k = flat.shape[1]
    pad = (-k) % ts
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad)), constant_values=-1)
    return flat, k


def sharded_lookup_alltoall(
    table: jnp.ndarray, ids: jnp.ndarray, ctx: LookupContext
) -> jnp.ndarray:
    """Row-sharded lookup via unique-id all-to-all (vs contribute-and-psum).

    Comm volume per step and device (E = row width, M = local slots, U =
    unique ids, ts = shards): psum moves ~2·M·E floats through the reduction
    regardless of duplicates; this path moves 2·ts·cap ids + 2·ts·cap·E row
    floats with cap ≈ capacity_factor·(M/ts)/ts per slot-slice — for
    Zipf-skewed production ids (U ≪ M) the row payload shrinks by ~M/U.
    Measured table: SPEED.md.
    """
    mesh = ctx.mesh
    ts = mesh.shape[ctx.table_axis]
    orig_shape = ids.shape
    flat_ids, k = _slots_split_for_alltoall(ids, ts)

    v = table.shape[0]
    pad = (-v) % ts
    if pad:
        table = jnp.pad(table, ((0, pad), (0, 0)))

    def _local(table_shard, ids_local):
        rows, overflow = _alltoall_unique_rows(
            table_shard, ids_local.reshape(-1), ctx
        )
        rows = jnp.where(overflow, jnp.nan, rows)
        return rows.reshape(*ids_local.shape, table_shard.shape[1])

    out = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(ctx.table_axis, None), P(ctx.data_axis, ctx.table_axis)),
        out_specs=P(ctx.data_axis, ctx.table_axis, None),
    )(table, flat_ids)
    return out[:, :k].reshape(*orig_shape, table.shape[1])


def sharded_packed_lookup_alltoall(
    packed_table: jnp.ndarray,
    ids: jnp.ndarray,
    embed_size: int,
    ctx: LookupContext,
) -> jnp.ndarray:
    """Packed-layout unique-id all-to-all lookup.

    Dedup happens at the STORED-row level (``id // P``), so the exchanged
    rows are full 128-lane transactions and P logical ids sharing a stored
    row cost one exchange entry; the in-row slot is decoded locally after
    the exchange.
    """
    mesh = ctx.mesh
    ts = mesh.shape[ctx.table_axis]
    pack = packed_table.shape[1] // embed_size
    orig_shape = ids.shape
    flat_ids, k = _slots_split_for_alltoall(ids, ts)

    vp = packed_table.shape[0]
    pad = (-vp) % ts
    if pad:
        packed_table = jnp.pad(packed_table, ((0, pad), (0, 0)))

    def _local(shard, ids_local):
        from torecsys_tpu.ops.embedding import packed_lookup

        flat = ids_local.reshape(-1)
        # exchange LOGICAL ids / E-float rows; the owner decodes its packed
        # (stored-row) layout locally — see _alltoall_unique_rows docstring
        rows, overflow = _alltoall_unique_rows(
            shard, flat, ctx,
            rows_per_shard=shard.shape[0] * pack,
            gather_fn=lambda sh, local_ids: packed_lookup(
                sh, local_ids, embed_size
            ),
        )
        rows = jnp.where(overflow, jnp.nan, rows)
        return rows.reshape(*ids_local.shape, embed_size)

    out = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(ctx.table_axis, None), P(ctx.data_axis, ctx.table_axis)),
        out_specs=P(ctx.data_axis, ctx.table_axis, None),
    )(packed_table, flat_ids)
    return out[:, :k].reshape(*orig_shape, embed_size)


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
