"""Sparse (touched-rows-only) embedding gradients: dedup + row-wise optimizers.

Why this exists: the reference updates its embedding tables through a dense
optimizer — every Adam step reads and writes params/m/v for **all** V rows
(``/root/reference/torecsys/inputs/base/multi_indices_emb.py:48`` is a plain
``nn.Embedding`` under ``torch.optim.Adam``).  At real Criteo hashing scale
(tens of millions of rows) that is gigabytes of HBM traffic per step for rows
whose gradient is exactly zero, and the dense ``(V, E)`` gradient buffer alone
can exceed chip HBM.  The TPU-native fix has two halves:

1. **Never materialize a dense table gradient.**  Input modules look up rows
   from a ``stop_gradient`` view of the table and route the looked-up rows
   through ``flax``'s ``perturb`` mechanism, so ``jax.grad`` produces per-slot
   gradients of shape ``(B, N, E)`` — O(batch), not O(vocab).
2. **Update only the touched rows.**  :func:`dedup_sum` turns the per-slot
   gradients into (unique row id, summed gradient) pairs of a *static* size
   (XLA-friendly: padding slots carry an out-of-bounds sentinel that scatter
   drops), and the :class:`RowAdam` / :class:`RowAdagrad` / :class:`RowSGD`
   transforms gather/update/scatter just those rows of the table and its
   optimizer slots.

Semantics note: this is **lazy** Adam (à la TF ``LazyAdamOptimizer``) — rows
not present in a batch keep their momentum frozen instead of continuing to
decay/apply it.  For plain Adam the two are bitwise identical while a row's
gradient stays zero *and* its momentum is zero; rows touched earlier diverge
slightly.  This is the standard, accepted trade for recsys embedding tables.

The context flag (:func:`use_sparse_embedding_grads`) is read at **trace
time** by the input modules, mirroring ``parallel.lookup.use_sharded_lookup``:
enter it around jit-tracing of the train step and the choice is baked into
the compiled program.
"""

from __future__ import annotations

import contextlib
import dataclasses
import threading
from typing import Dict, Optional

import jax
import jax.numpy as jnp

_state = threading.local()


def sparse_grads_enabled() -> bool:
    """True inside a :func:`use_sparse_embedding_grads` block."""
    return bool(getattr(_state, "on", False))


@contextlib.contextmanager
def use_sparse_embedding_grads():
    """Route embedding lookups traced inside this block through the
    stop-gradient + perturbation path (per-slot grads, no dense cotangent)."""
    prev = getattr(_state, "on", False)
    _state.on = True
    try:
        yield
    finally:
        _state.on = prev


def prefix_sum(x: jnp.ndarray, block: int = 512) -> jnp.ndarray:
    """Inclusive prefix sum of a 1-D array, TPU-compile-friendly.

    ``jnp.cumsum`` over a ~100k-element axis lowers to a reduce-window whose
    XLA TPU compile blows up (measured: >5 min for M=106496 — it dominates
    every jit that embeds it).  Two-level formulation: cumsum within
    ``block``-sized rows, then cumsum of the row totals, then broadcast-add —
    both windows are small, compile is seconds, runtime is two streaming
    passes.
    """
    m = x.shape[0]
    pad = (-m) % block
    xp = jnp.pad(x, (0, pad)) if pad else x
    rows = xp.reshape(-1, block)
    within = jnp.cumsum(rows, axis=1)
    carry = jnp.concatenate(
        [jnp.zeros((1,), x.dtype), jnp.cumsum(within[:-1, -1])]
    )
    out = (within + carry[:, None]).reshape(-1)
    return out[:m] if pad else out


def dedup_sum(ids: jnp.ndarray, grads: jnp.ndarray, num_rows: int):
    """Combine duplicate-id gradients: ``(M,) ids, (M, E) grads → (M,), (M, E)``.

    Returns ``(uids, gsum)`` where slot ``k < n_unique`` holds the k-th unique
    id (sorted) and the sum of its occurrences' gradients — matching the
    dense scatter-add semantics of autodiff through a gather — and slots
    ``k >= n_unique`` hold the out-of-bounds sentinel ``num_rows`` with zero
    gradient, so downstream ``.at[uids].set(..., mode='drop')`` ignores them.
    Static output size M keeps the whole pipeline jit-compatible.
    """
    m = ids.shape[0]
    ids = ids.astype(jnp.int32)
    sorted_ids, order = jax.lax.sort_key_val(ids, jnp.arange(m, dtype=jnp.int32))
    g_sorted = jnp.take(grads, order, axis=0)
    is_first = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), sorted_ids[1:] != sorted_ids[:-1]]
    )
    seg = prefix_sum(is_first.astype(jnp.int32)) - 1  # segment per position
    gsum = jax.ops.segment_sum(g_sorted, seg, num_segments=m)
    uids = jax.ops.segment_max(sorted_ids, seg, num_segments=m)
    n_unique = seg[-1] + 1
    valid = jnp.arange(m, dtype=jnp.int32) < n_unique
    uids = jnp.where(valid, uids, jnp.int32(num_rows))
    return uids, gsum


def dedup_sum_stored(
    ids: jnp.ndarray, grads: jnp.ndarray, pack: int, num_stored_rows: int
):
    """Stored-row-space dedup: ``(M,) logical ids, (M, E) grads →
    (M,) unique stored-row ids, (M, P*E) wide summed grads``.

    TPU rationale: per-row gathers/scatters are only efficient at full lane
    width (128); updating in the packed stored layout makes every touched-row
    access a ``(P*E,)``-wide transaction.  Each logical grad is placed into
    its in-row slot (``id % P``) via a one-hot MXU contraction, then summed
    per stored row (``id // P``).

    Semantics: optimizer laziness becomes stored-row-granular — a logical row
    sharing a stored row with a touched one gets a zero gradient (for Adam:
    its momentum decays like dense Adam's would; rows with zero momentum are
    bitwise unchanged).
    """
    if pack == 1:
        return dedup_sum(ids, grads, num_stored_rows)
    m, e = grads.shape
    hi = ids.astype(jnp.int32) // pack
    lo = ids.astype(jnp.int32) % pack
    oh = jax.nn.one_hot(lo, pack, dtype=grads.dtype)
    wide = jnp.einsum("mp,me->mpe", oh, grads).reshape(m, pack * e)
    return dedup_sum(hi, wide, num_stored_rows)


def _combine_sorted_stored(sorted_ids, g_sorted, pack, num_stored_rows):
    """Shared tail of the dedup paths: an id-ascending ``(M,)`` stream +
    matching ``(M, E)`` grads → compact ``(M,) unique stored-row ids`` +
    ``(M, P*E)`` wide summed grads.

    Formulation chosen by measurement on v5e (Criteo shapes, M≈106k; see
    SPEED.md): one-hot einsum widen of the *sorted* narrow grads (0.4 ms,
    MXU) + a sorted-segment ``segment_sum`` beats a 2-D ``.at[seg,lo].add``
    scatter by >5x (XLA lowers multi-index scatter-adds to a serialized
    loop), and the scatter-set of uids replaces the old ``segment_max``.
    """
    m, e = g_sorted.shape
    sorted_ids = sorted_ids.astype(jnp.int32)
    hi = sorted_ids // pack
    is_first = jnp.concatenate([jnp.ones((1,), bool), hi[1:] != hi[:-1]])
    seg = prefix_sum(is_first.astype(jnp.int32)) - 1
    # All writers of uids[s] carry the same value (hi is constant within a
    # segment), so plain scatter-set is deterministic here.
    uids = jnp.full((m,), num_stored_rows, jnp.int32).at[seg].set(
        hi, indices_are_sorted=True
    )
    gsum = _sorted_gsum(g_sorted, sorted_ids % pack, seg, pack)
    return uids, gsum


def _sorted_gsum(g_sorted, lo, seg, pack):
    """Segment-sum a sorted NARROW grad stream into wide stored-row sums.

    Kernel path (TPU / interpret): ``sorted_widen_segment_sum`` — the
    one-hot widen runs in-kernel on the VPU, so the ``(M, P*E)`` widened
    stream never round-trips HBM (r4's widen einsum wrote + re-read ~54 MB
    at Criteo shapes); the combine is the same streaming + sub-tiled MXU
    scheme.  XLA fallback: einsum widen + sorted ``segment_sum`` (XLA
    lowers it to a row-granular scatter-add, ~8 ns/row — see SPEED.md).
    """
    m, e = g_sorted.shape
    if _fused_eligible_width(pack * e, g_sorted.dtype) or _interpret():
        from torecsys_tpu.ops.pallas.sparse_update import (
            sorted_segment_sum_wide,
            sorted_widen_segment_sum,
        )

        if pack == 1:
            return sorted_segment_sum_wide(g_sorted, seg, interpret=_interpret())
        return sorted_widen_segment_sum(
            g_sorted, lo, seg, pack, interpret=_interpret()
        )
    if pack == 1:
        wide = g_sorted
    else:
        oh = jax.nn.one_hot(lo, pack, dtype=g_sorted.dtype)
        wide = jnp.einsum("mp,me->mpe", oh, g_sorted).reshape(m, pack * e)
    return jax.ops.segment_sum(wide, seg, num_segments=m, indices_are_sorted=True)


def dedup_sum_fields(
    ids: jnp.ndarray, grads: jnp.ndarray, pack: int, num_stored_rows: int
):
    """Dedup per-slot gradients into stored-row space: ``(B, K) ids,
    (B, K, E) grads → (B*K,) unique stored-row ids, (B*K, P*E) wide sums``.

    The train-step entry point (``train.steps.sparse_train_step``).  Differs
    from :func:`dedup_sum_stored` in op ordering: the permutation is applied
    to the *narrow* ``(M, E)`` grads (8x less gather traffic than permuting
    the widened ``(M, P*E)`` grads) and the widen runs on the sorted stream
    where it fuses into the segment sum's input.

    Output contract matches :func:`dedup_sum_stored` (ascending unique
    stored-row ids, sentinel-padded; wide summed grads).
    """
    e = grads.shape[-1]
    flat_ids = ids.reshape(-1).astype(jnp.int32)
    flat_g = grads.reshape(-1, e)
    m = flat_ids.shape[0]
    sorted_ids, order = jax.lax.sort_key_val(
        flat_ids, jnp.arange(m, dtype=jnp.int32)
    )
    g_sorted = jnp.take(flat_g, order, axis=0)
    return _combine_sorted_stored(sorted_ids, g_sorted, pack, num_stored_rows)


def _rows(arr: jnp.ndarray, embed_size: int) -> jnp.ndarray:
    """Logical ``(rows, E)`` view of a (possibly packed / 3-D) table.

    Packed ``(Vp, P*E)`` and field-aware ``(N, Vp, P*E)`` tables reshape to
    logical rows for free (same memory layout); ids produced by the input
    modules address exactly this view.
    """
    return arr.reshape(-1, embed_size)


def _take0(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    # OOB sentinel slots gather zeros (never garbage) and are dropped on
    # write; dedup_sum emits ids ascending, so declare sortedness.
    return jnp.take(
        arr, idx, axis=0, mode="fill", fill_value=0, indices_are_sorted=True
    )


def _put(arr: jnp.ndarray, idx: jnp.ndarray, val: jnp.ndarray) -> jnp.ndarray:
    return arr.at[idx].set(
        val, mode="drop", unique_indices=True, indices_are_sorted=True
    )


def _interpret() -> bool:
    """Run the fused kernels in Pallas interpret mode (CPU rig opt-in)."""
    from torecsys_tpu.ops import pallas as _pallas

    return _pallas.sparse_interpret()


def _fused_eligible_width(width: int, dtype) -> bool:
    """Shape/dtype/backend gate of :func:`_fused_eligible`, without needing
    a materialized rows view (the widen-fused segsum kernel is chosen from
    the NARROW stream's ``pack * e`` width)."""
    from torecsys_tpu.ops import pallas as _pallas

    return (
        width % 128 == 0
        and dtype == jnp.float32
        and _pallas.sparse_update_enabled()
        and (
            _sharded_update_ctx() is None
            or getattr(_state, "shard_local", False)
        )
    )


def _fused_eligible(rows_view: jnp.ndarray) -> bool:
    """True when the fused Pallas update kernel can take this table.

    Sharding gate: when the lookup mesh actually SPLITS the table axis the
    tables are row-sharded (``parallel.sharding``), and ``pallas_call`` has
    no SPMD partitioning rule — GSPMD would all-gather and replicate the
    multi-GB table/slot operands on every chip.  Those runs route through
    :func:`sharded_row_update` (shard_map with shard-local id filtering, so
    the same kernel runs per table shard); the plain XLA gather/scatter
    remains the fallback inside each shard when the kernel is unavailable.
    Pure data-parallel meshes (table axis size 1) and replicated tables keep
    the kernel: their tables are replicated, so the replicated kernel
    execution GSPMD falls back to is exactly the single-device semantics
    (r3 ADVICE: the old gate disabled the kernel for ANY active context).
    """
    return _fused_eligible_width(rows_view.shape[-1], rows_view.dtype)


@contextlib.contextmanager
def _shard_local_update():
    """Inside :func:`sharded_row_update`'s per-shard body the operands are
    already shard-local, so the kernel gate may ignore the mesh context."""
    prev = getattr(_state, "shard_local", False)
    _state.shard_local = True
    try:
        yield
    finally:
        _state.shard_local = prev


def _sharded_update_ctx():
    """Active sharded-lookup context iff the table axis is really split."""
    from torecsys_tpu.parallel import lookup as _lookup

    ctx = _lookup._context()
    if ctx is None or ctx.mesh.shape.get(ctx.table_axis, 1) <= 1:
        return None
    return ctx


def sharded_row_update(row_tx, table, slots, uids, gsum, step, ctx):
    """Apply a row-wise optimizer to a ROW-SHARDED table, shard-locally.

    Each table shard filters the (replicated) unique-id stream down to the
    rows it owns — they form one contiguous run of the ascending ``uids``,
    so a dynamic ``roll`` turns the run into the valid PREFIX the fused
    kernel's dynamic grid expects — then applies the same ``row_tx.update``
    (Pallas kernel on TPU, XLA gather/scatter elsewhere) to its local rows
    only.  No all-gather, no replicated multi-GB operands: the generic-XLA
    alternative under GSPMD was correct but left the kernel unused
    (r2 ADVICE finding).
    """
    from jax.sharding import PartitionSpec as P

    w = table.shape[-1]
    stored_shape = table.reshape(-1, w).shape
    total_rows = stored_shape[0]
    ts = ctx.mesh.shape[ctx.table_axis]
    if total_rows % ts != 0:
        # padding-mismatched table: keep the GSPMD-partitioned XLA path
        return row_tx.update(table, slots, uids, gsum, step)

    flat_table = table.reshape(-1, w)

    def _local(tbl_shard, slot_shard, uids_g, gsum_g, step_g):
        local_rows = tbl_shard.shape[0]
        base = jax.lax.axis_index(ctx.table_axis) * local_rows
        # my rows form one ascending contiguous run: rotate it to the front
        start = jnp.sum(uids_g < base, dtype=jnp.int32)
        rolled_u = jnp.roll(uids_g, -start) - base
        rolled_g = jnp.roll(gsum_g, -start, axis=0)
        mine = (rolled_u >= 0) & (rolled_u < local_rows)
        local_u = jnp.where(mine, rolled_u, jnp.int32(local_rows))  # sentinel
        local_g = jnp.where(mine[:, None], rolled_g, 0.0)
        with _shard_local_update():
            new_tbl, new_slots = row_tx.update(
                tbl_shard, slot_shard, local_u, local_g, step_g
            )
        return new_tbl, new_slots

    slot_specs = jax.tree_util.tree_map(
        lambda a: P(ctx.table_axis, *([None] * (a.ndim - 1))), slots
    )
    new_flat, new_slots = jax.shard_map(
        _local,
        mesh=ctx.mesh,
        in_specs=(P(ctx.table_axis, None), slot_specs, P(), P(), P()),
        out_specs=(P(ctx.table_axis, None), slot_specs),
        # pallas_call outputs carry no varying-mesh-axes metadata, which
        # trips shard_map's vma check; the body is shard-local by
        # construction (every operand filtered to this shard's rows).
        check_vma=False,
    )(flat_table, slots, uids, gsum, step)
    return new_flat.reshape(table.shape), new_slots


def sort_slot_grads(ids: jnp.ndarray, grads: jnp.ndarray):
    """Sort per-slot grads by id: ``(B, K) ids, (B, K, E) grads →
    (M,) sorted ids, (M, E) permuted grads`` — the input contract of the
    fused dedup+update kernel (``ops.pallas.sparse_update``).  The
    permutation moves the *narrow* grads (8x less gather traffic than
    permuting widened rows)."""
    e = grads.shape[-1]
    flat_ids = ids.reshape(-1).astype(jnp.int32)
    flat_g = grads.reshape(-1, e)
    m = flat_ids.shape[0]
    sorted_ids, order = jax.lax.sort_key_val(
        flat_ids, jnp.arange(m, dtype=jnp.int32)
    )
    return sorted_ids, jnp.take(flat_g, order, axis=0)


class _RowOptimizerBase:
    """Shared sorted-stream entry point of the row-wise optimizers.

    ``update_sorted`` consumes the raw sorted (id, grad) stream.  Default
    path: the XLA combine (:func:`_combine_sorted_stored` — one-hot einsum
    widen + sorted segment_sum) feeding the dynamic-grid post-dedup Pallas
    kernel via ``update``.

    An alternative FULLY-fused kernel (in-kernel widen + MXU segment
    combine + boundary carry + row RMW in one pass —
    ``ops/pallas/sparse_update.fused_sorted_dedup_update``) exists behind
    ``TORECSYS_TPU_FUSED_DEDUP=1``.  Measured on v5e (SPEED.md) it TIES the
    default at 500k rows (3.75 vs 3.73 ms/step) and LOSES at scale (4.97 vs
    4.26 at 8M; 5.35 vs 4.59 at 30M): its per-tile MXU combine + the 208
    fixed grid tiles' short RMW bursts drain the DMA pipeline more than the
    XLA segment-sum costs.  Kept opt-in, tested, as an honest negative
    result — the default is the measured winner, not the fancier kernel.
    """

    def hyper_and_rule(self, step):
        raise NotImplementedError

    def _slot_tuple(self, slots, w):
        return ()

    def _slots_from_tuple(self, new_slots, slots):
        return {}

    def update_sorted(self, table, slots, sorted_ids, g_sorted, step,
                      interpret=False):
        import os

        e = g_sorted.shape[-1]
        shape = table.shape
        w = shape[-1]
        pack = w // e
        tbl = table.reshape(-1, w)
        use_fused_dedup = os.environ.get("TORECSYS_TPU_FUSED_DEDUP", "0") in (
            "1", "true", "on",
        )
        if (use_fused_dedup and _fused_eligible(tbl)) or interpret:
            from torecsys_tpu.ops.pallas.sparse_update import (
                fused_sorted_dedup_update,
            )

            hyper, rule = self.hyper_and_rule(step)
            slot_tuple = self._slot_tuple(slots, w)
            new_t, new_slots = fused_sorted_dedup_update(
                sorted_ids, g_sorted, tbl, slot_tuple, hyper, pack, rule,
                interpret=interpret,
            )
            return new_t.reshape(shape), self._slots_from_tuple(new_slots, slots)
        uids, gsum = _combine_sorted_stored(
            sorted_ids, g_sorted, pack, tbl.shape[0]
        )
        ctx = _sharded_update_ctx()
        if (
            ctx is not None
            and table.ndim == 2
            and tbl.shape[0] % ctx.mesh.shape[ctx.table_axis] == 0
            and tbl.shape[0] >= ctx.min_rows_to_shard
        ):
            # row-sharded table: run the update shard-locally so the fused
            # kernel applies per shard (3-D field-aware tables shard their
            # MIDDLE axis — their flat row space is not one contiguous run
            # per shard, so they keep the GSPMD-partitioned XLA path)
            return sharded_row_update(self, table, slots, uids, gsum, step, ctx)
        return self.update(table, slots, uids, gsum, step)

    def update_from_host_aux(self, table, slots, flat_g, aux, step):
        """Trusted PRESORTED route: the id-stream preprocessing — sort
        order, in-row slots, stored-row segment ids, compact unique
        stored-row ids, unique count — arrives precomputed from the HOST
        input pipeline (``data.presort``), overlapped with device steps.

        Removes three row-granular device passes the on-device route pays
        per step (measured on v5e at Criteo shapes, SPEED.md r5): the id
        sort (~0.37 ms), the prefix-sum + compact-uids scatter (~0.4 ms),
        and the M-wide valid-count reduction.  The device-side work left is
        the narrow grad permute (host order), the widen-fused segment-sum
        kernel, and the touched-row RMW kernel.

        Args:
            flat_g: ``(M, E)`` per-slot grads in original slot order.
            aux: dict with ``order`` (M,), ``lo`` (M,), ``seg`` (M,),
                ``uids`` (M,) compact ascending sentinel-padded, and
                ``n_unique`` scalar — the :class:`data.presort.Presorter`
                contract (validated against the device route by
                ``tests/test_presort.py``).
        """
        e = flat_g.shape[-1]
        shape = table.shape
        w = shape[-1]
        pack = w // e
        tbl = table.reshape(-1, w)
        g_sorted = jnp.take(flat_g, aux["order"], axis=0)
        gsum = _sorted_gsum(g_sorted, aux["lo"], aux["seg"], pack)
        uids = aux["uids"].astype(jnp.int32)
        ctx = _sharded_update_ctx()
        if (
            ctx is not None
            and table.ndim == 2
            and tbl.shape[0] % ctx.mesh.shape[ctx.table_axis] == 0
            and tbl.shape[0] >= ctx.min_rows_to_shard
        ):
            return sharded_row_update(self, table, slots, uids, gsum, step, ctx)
        return self.update(table, slots, uids, gsum, step,
                           n_valid=aux.get("n_unique"))


@dataclasses.dataclass(frozen=True)
class RowAdam(_RowOptimizerBase):
    """Lazy row-wise Adam(W) over an embedding table.

    Matches ``optax.adam`` / ``optax.adamw`` math on the touched rows
    (global-step bias correction, decoupled weight decay for AdamW).

    Slot layout: one ``mv`` array of shape ``(..., 2, W)`` holding first and
    second moments side by side per stored row (``[..., 0, :]`` = m,
    ``[..., 1, :]`` = v).  Both moments are always read and written together,
    so fusing them halves the random-access transactions of the touched-row
    update — the dominant cost at scale (one row-DMA instead of two per phase
    in the Pallas kernel, one gather+scatter instead of two on the XLA path).
    The extra minor dim (instead of a ``2*W``-wide row) keeps every DMA a
    stack of native ``(1, 128)`` tiles, which Mosaic requires.
    """

    learning_rate: float = 1e-3
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.0

    def init(self, table: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        shape = table.shape[:-1] + (2, table.shape[-1])
        return {"mv": jnp.zeros(shape, table.dtype)}

    def moments(self, table, slots):
        """Unfused (m, v) views of the slots — convenience for tests."""
        return slots["mv"][..., 0, :], slots["mv"][..., 1, :]

    def hyper_and_rule(self, step):
        t = (step + 1).astype(jnp.float32)
        bc1 = 1.0 / (1.0 - jnp.power(self.b1, t))
        bc2 = 1.0 / (1.0 - jnp.power(self.b2, t))
        return jnp.stack([
            jnp.float32(self.learning_rate), jnp.float32(self.b1),
            jnp.float32(self.b2), jnp.float32(self.eps),
            jnp.float32(self.weight_decay), bc1, bc2,
        ]), "adam"

    def _slot_tuple(self, slots, w):
        return (slots["mv"].reshape(-1, 2, w),)

    def _slots_from_tuple(self, new_slots, slots):
        return {"mv": new_slots[0].reshape(slots["mv"].shape)}

    def update(self, table, slots, uids, gsum, step, n_valid=None):
        e = gsum.shape[-1]
        shape = table.shape
        mv_shape = slots["mv"].shape
        tbl = _rows(table, e)
        mv = slots["mv"].reshape(-1, 2, e)
        t = (step + 1).astype(jnp.float32)
        bc1 = 1.0 / (1.0 - jnp.power(self.b1, t))
        bc2 = 1.0 / (1.0 - jnp.power(self.b2, t))
        if _fused_eligible(tbl):
            from torecsys_tpu.ops.pallas.sparse_update import fused_rowwise_update

            hyper, _ = self.hyper_and_rule(step)
            new_t, (new_mv,) = fused_rowwise_update(
                uids, gsum, tbl, (mv,), hyper, "adam",
                interpret=_interpret(), n_valid=n_valid,
            )
            return new_t.reshape(shape), {"mv": new_mv.reshape(mv_shape)}
        row_u, mv_u = _take0(tbl, uids), _take0(mv, uids)
        m_u, v_u = mv_u[:, 0, :], mv_u[:, 1, :]
        new_m = self.b1 * m_u + (1.0 - self.b1) * gsum
        new_v = self.b2 * v_u + (1.0 - self.b2) * jnp.square(gsum)
        upd = self.learning_rate * ((new_m * bc1) / (jnp.sqrt(new_v * bc2) + self.eps))
        if self.weight_decay:
            upd = upd + self.learning_rate * self.weight_decay * row_u
        new_mv = jnp.stack([new_m, new_v], axis=1)
        return (
            _put(tbl, uids, row_u - upd).reshape(shape),
            {"mv": _put(mv, uids, new_mv).reshape(mv_shape)},
        )


@dataclasses.dataclass(frozen=True)
class RowAdagrad(_RowOptimizerBase):
    """Lazy row-wise Adagrad (matches ``optax.adagrad``'s scale_by_rss)."""

    learning_rate: float = 1e-3
    initial_accumulator_value: float = 0.1
    eps: float = 1e-7

    def init(self, table: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return {"v": jnp.full_like(table, self.initial_accumulator_value)}

    def hyper_and_rule(self, step):
        return jnp.stack([
            jnp.float32(self.learning_rate), jnp.float32(0), jnp.float32(0),
            jnp.float32(self.eps), jnp.float32(0), jnp.float32(1), jnp.float32(1),
        ]), "adagrad"

    def _slot_tuple(self, slots, w):
        return (slots["v"].reshape(-1, w),)

    def _slots_from_tuple(self, new_slots, slots):
        return {"v": new_slots[0].reshape(slots["v"].shape)}

    def update(self, table, slots, uids, gsum, step, n_valid=None):
        e = gsum.shape[-1]
        shape = table.shape
        tbl, v = _rows(table, e), _rows(slots["v"], e)
        if _fused_eligible(tbl):
            from torecsys_tpu.ops.pallas.sparse_update import fused_rowwise_update

            hyper, _ = self.hyper_and_rule(step)
            new_t, (new_v,) = fused_rowwise_update(
                uids, gsum, tbl, (v,), hyper, "adagrad",
                interpret=_interpret(), n_valid=n_valid,
            )
            return new_t.reshape(shape), {"v": new_v.reshape(shape)}
        row_u, v_u = _take0(tbl, uids), _take0(v, uids)
        new_v = v_u + jnp.square(gsum)
        # optax.scale_by_rss: update = g * (1/sqrt(v + eps)) masked where v>0
        upd = self.learning_rate * gsum * jax.lax.rsqrt(new_v + self.eps)
        return (
            _put(tbl, uids, row_u - upd).reshape(shape),
            {"v": _put(v, uids, new_v).reshape(shape)},
        )


@dataclasses.dataclass(frozen=True)
class RowSGD(_RowOptimizerBase):
    """Row-wise plain SGD (no momentum — momentum configs fall back dense)."""

    learning_rate: float = 1e-3

    def init(self, table: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return {}

    def hyper_and_rule(self, step):
        return jnp.stack([
            jnp.float32(self.learning_rate), jnp.float32(0), jnp.float32(0),
            jnp.float32(0), jnp.float32(0), jnp.float32(1), jnp.float32(1),
        ]), "sgd"

    def update(self, table, slots, uids, gsum, step, n_valid=None):
        e = gsum.shape[-1]
        shape = table.shape
        tbl = _rows(table, e)
        if _fused_eligible(tbl):
            from torecsys_tpu.ops.pallas.sparse_update import fused_rowwise_update

            hyper, _ = self.hyper_and_rule(step)
            new_t, _ = fused_rowwise_update(
                uids, gsum, tbl, (), hyper, "sgd", interpret=_interpret(),
                n_valid=n_valid,
            )
            return new_t.reshape(shape), {}
        row_u = _take0(tbl, uids)
        new_rows = row_u - self.learning_rate * gsum
        return _put(tbl, uids, new_rows).reshape(shape), {}


def get_row_optimizer(method: str = "Adam", lr: float = 1e-3, **kwargs) -> Optional[object]:
    """Row-wise twin of ``train.optimizers.get_optimizer`` for the names that
    have a lazy formulation; returns None when the config is unsupported (the
    caller then falls back to the dense optax path).
    """
    lr = kwargs.pop("learning_rate", lr)
    name = method.lower()
    try:
        if name == "adam":
            return RowAdam(learning_rate=lr, **kwargs)
        if name == "adamw":
            kwargs.setdefault("weight_decay", 1e-4)  # optax.adamw default
            return RowAdam(learning_rate=lr, **kwargs)
        if name == "adagrad":
            return RowAdagrad(learning_rate=lr, **kwargs)
        if name == "sgd" and not kwargs:
            return RowSGD(learning_rate=lr)
    except TypeError:  # unsupported kwarg for this optimizer
        return None
    return None
