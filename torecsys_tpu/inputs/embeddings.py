"""Categorical / value input modules (the embedding front-end).

Parity with ``/root/reference/torecsys/inputs/base/``:

* :class:`ValueInput`            — ``value_inp.py:8-44``
* :class:`SingleIndexEmbedding`  — ``single_index_emb.py:9-59``
* :class:`MultiIndicesEmbedding` — ``multi_indices_emb.py:10-112`` (the
  workhorse: one fused table with per-field offsets)
* :class:`MultiIndicesFieldAwareEmbedding` — ``multi_indices_field_aware_emb.py:10-111``
* :class:`ConcatInput`           — ``concat_inputs.py:9-129``
* :class:`StackedInput`          — ``stacked_inp.py:9-136``

TPU design: the fused table is a single ``(sum(field_sizes), E)`` parameter so
the lookup is one gather (one Pallas kernel slot); the field-aware variant is
one ``(N, sum(field_sizes), E)`` parameter (N logical tables in one array —
shardable over a mesh axis, cf. SURVEY.md §2.2 TPU mapping). Offsets are
static numpy constants, no device juggling (the reference moved offsets with
``.cuda()/.cpu()``, ``multi_indices_emb.py:66-89``).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from torecsys_tpu.inputs.base import BaseInput, Batch
from torecsys_tpu.ops.embedding import field_offsets, pack_factor, packed_shape
from torecsys_tpu.ops.sparse import sparse_grads_enabled
from torecsys_tpu.parallel.lookup import (
    maybe_sharded_lookup,
    maybe_sharded_packed_lookup,
)


def _find_presort_aux(module, batch: Batch):
    """Pick this module's host-presort aux arrays out of the batch, if the
    input pipeline attached them (``data.presort.Presorter``).

    The producer keys the arrays by a content hash of the module's id-stream
    schema; the module recomputes the same hash here, so producer and
    consumer need no shared registry.  Returns None when absent — the train
    step then falls back to the on-device sort route.
    """
    if not sparse_grads_enabled():
        return None
    from torecsys_tpu.data.presort import AUX_NAMES, spec_for_module

    spec = spec_for_module(module)
    if spec is None or spec.aux_key("order") not in batch:
        return None
    return {name: batch[spec.aux_key(name)] for name in AUX_NAMES}


def _sow_presort_aux(module, aux) -> None:
    """Sow the aux under ``lookup_aux`` so the jitted train step can route
    this table's update through ``ops.sparse.update_from_host_aux`` (the
    sow lands next to the module's ``lookup_ids``, keeping producer and
    consumer aligned without path bookkeeping)."""
    if aux is not None:
        for name, value in aux.items():
            module.sow("lookup_aux", name, value)


def _xavier_uniform():
    return nn.initializers.xavier_uniform()


def _table_param_dtype():
    """Storage dtype of embedding-table params (layers.precision context;
    f32 default — bf16 halves the DENSE path's table traffic, SPEED.md)."""
    from torecsys_tpu.layers.precision import table_dtype

    return table_dtype() or jnp.float32


def _as_f32(rows: jnp.ndarray) -> jnp.ndarray:
    """Cast looked-up rows to f32 at the module boundary: interaction and
    loss math stays full precision regardless of the storage dtype."""
    return rows.astype(jnp.float32) if rows.dtype != jnp.float32 else rows


def _xavier_uniform_logical(total_rows: int, embed_size: int):
    """Xavier-uniform with the *logical* ``(V, E)`` fan, applied to a packed
    ``(V/P, P*E)`` stored shape (packing must not change the init scale)."""
    limit = float(np.sqrt(6.0 / (total_rows + embed_size)))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)

    return init


class ValueInput(BaseInput):
    """Pass dense values through as ``(B, N, 1)`` first-order features.

    Reference: ``value_inp.py:8-44``.
    """

    fields: Tuple[str, ...]
    transform: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None

    @property
    def embed_size(self) -> int:
        return 1

    @nn.compact
    def __call__(self, batch: Batch, training: bool = False) -> jnp.ndarray:
        cols = []
        for name in self.fields:
            x = batch[name].astype(jnp.float32)
            if x.ndim == 1:
                x = x[:, None]
            cols.append(x)
        out = jnp.concatenate(cols, axis=1)[..., None]  # (B, N, 1)
        if self.transform is not None:
            out = self.transform(out)
        return out


class SingleIndexEmbedding(BaseInput):
    """One embedding table for one categorical field → ``(B, 1, E)``.

    Reference: ``single_index_emb.py:9-59`` (supports pre-trained weights via
    the ``pretrained`` initializer).
    """

    field_size: int
    embed_size: int
    fields: Tuple[str, ...]
    pretrained: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, batch: Batch, training: bool = False) -> jnp.ndarray:
        dtype = _table_param_dtype()
        if self.pretrained is not None:
            init = lambda *_: jnp.asarray(self.pretrained, dtype=dtype)
        else:
            init = nn.initializers.normal(stddev=0.01, dtype=dtype)
        table = self.param("embedding", init, (self.field_size, self.embed_size))
        ids = self._stack_fields(batch, self.fields)  # (B, 1)
        if sparse_grads_enabled():
            return self._sparse_lookup(table, ids, _find_presort_aux(self, batch))
        return _as_f32(maybe_sharded_lookup(table, ids))  # (B, 1, E)

    def _sparse_lookup(self, table, ids, aux=None):
        """Touched-rows-only gradient path (see ``ops.sparse``): rows come
        from a stop-gradient view; per-slot grads flow through the
        perturbation; the ids are sown for the row-wise optimizer."""
        rows = maybe_sharded_lookup(jax.lax.stop_gradient(table), ids)
        rows = self.perturb("lookup", rows)
        self.sow("lookup_ids", "ids", ids)
        _sow_presort_aux(self, aux)
        return rows


class MultiIndicesEmbedding(BaseInput):
    """Fused embedding over several categorical fields → ``(B, N, E)``.

    One table of ``sum(field_sizes)`` rows; raw per-field ids are shifted by
    static offsets (``cumsum(field_sizes)``) before a single gather — the
    reference's offset trick (``multi_indices_emb.py:48-54,103-104``) kept,
    because it turns N small gathers into one large one (TPU-friendly).

    ``flatten=True`` reshapes the output to ``(B, 1, N*E)``
    (``multi_indices_emb.py`` flatten option).
    """

    embed_size: int
    field_sizes: Tuple[int, ...]
    fields: Tuple[str, ...]
    flatten: bool = False
    init_std: float = 0.01

    def setup(self):
        if len(self.fields) != len(self.field_sizes):
            raise ValueError(
                f"fields ({len(self.fields)}) and field_sizes "
                f"({len(self.field_sizes)}) must align"
            )
        total = int(sum(self.field_sizes))
        # Stored packed: P logical rows per 128-lane stored row (see
        # torecsys_tpu.ops.embedding.pack_factor — 2.6x faster gathers and
        # 4.2x faster scatter-add gradients on TPU for E=16).
        self.table = self.param(
            "embedding",
            nn.initializers.normal(stddev=self.init_std,
                                   dtype=_table_param_dtype()),
            packed_shape(total, self.embed_size),
        )
        self.offsets = field_offsets(self.field_sizes)

    def __call__(self, batch: Batch, training: bool = False) -> jnp.ndarray:
        ids = self._stack_fields(batch, self.fields)  # (B, N)
        out = self.embed(ids, aux=_find_presort_aux(self, batch))
        if self.flatten:
            b = out.shape[0]
            out = out.reshape(b, 1, -1)
        return out

    def embed(self, ids: jnp.ndarray, aux=None) -> jnp.ndarray:
        """Direct tensor-level lookup of raw per-field ids ``(B, N) → (B, N, E)``."""
        shifted = ids + jnp.asarray(self.offsets, dtype=ids.dtype)[None, :]
        if sparse_grads_enabled():
            # Touched-rows-only gradient path (ops.sparse): forward value is
            # identical; the table's dense cotangent is never materialized.
            rows = maybe_sharded_packed_lookup(
                jax.lax.stop_gradient(self.table), shifted, self.embed_size
            )
            rows = self.perturb("lookup", rows)
            self.sow("lookup_ids", "ids", shifted)
            _sow_presort_aux(self, aux)
            return rows
        return _as_f32(
            maybe_sharded_packed_lookup(self.table, shifted, self.embed_size)
        )


class MultiIndicesFieldAwareEmbedding(BaseInput):
    """Field-aware (FFM) embedding → ``(B, N*N, E)``.

    N logical tables, each of ``sum(field_sizes)`` rows
    (``multi_indices_field_aware_emb.py:50``), stored as one ``(N, V, E)``
    parameter. Output entry ``i*N + j`` is field j's embedding looked up in
    field-aware table i — matching the reference's concat order so
    downstream FFM math reshapes identically. Xavier-uniform init per the
    reference.

    ``flatten=True`` → ``(B, 1, N*N*E)``.
    """

    embed_size: int
    field_sizes: Tuple[int, ...]
    fields: Tuple[str, ...]
    flatten: bool = False

    def setup(self):
        n = len(self.field_sizes)
        total = int(sum(self.field_sizes))
        self.tables = self.param(
            "embedding",
            _xavier_uniform_logical(total, self.embed_size),
            (n, *packed_shape(total, self.embed_size)),
            _table_param_dtype(),
        )
        self.offsets = field_offsets(self.field_sizes)

    def __call__(self, batch: Batch, training: bool = False) -> jnp.ndarray:
        ids = self._stack_fields(batch, self.fields)  # (B, N)
        n = len(self.field_sizes)
        shifted = ids + jnp.asarray(self.offsets, dtype=ids.dtype)[None, :]
        b = ids.shape[0]
        if sparse_grads_enabled():
            out = self._sparse_lookup(
                shifted, n, _find_presort_aux(self, batch)
            ).reshape(b, n * n, self.embed_size)
        else:
            # vmap the lookup over the N tables:
            # (N, Vp, P*E) x (B, N) -> (N, B, N, E)
            per_table = jax.vmap(
                lambda t: maybe_sharded_packed_lookup(t, shifted, self.embed_size)
            )(self.tables)
            out = jnp.transpose(per_table, (1, 0, 2, 3))  # (B, Ntab, Nfield, E)
            out = _as_f32(out.reshape(b, n * n, self.embed_size))
        if self.flatten:
            out = out.reshape(b, 1, -1)
        return out

    def _sparse_lookup(self, shifted: jnp.ndarray, n: int, aux=None) -> jnp.ndarray:
        """Touched-rows-only gradient path over the N logical tables.

        The ``(N, Vp, P*E)`` parameter is viewed as one flat packed table of
        ``N * Vp * P`` logical rows; slot ``(i, j)``'s global row id is
        ``i * Vp * P + shifted[:, j]`` — the same logical-row indexing the
        row-wise optimizer's ``(rows, E)`` view uses.
        """
        vp, w = self.tables.shape[1], self.tables.shape[2]
        rows_per_table = vp * (w // self.embed_size)
        flat_tables = jax.lax.stop_gradient(self.tables).reshape(-1, w)
        gids = (
            shifted[:, None, :]
            + (jnp.arange(n, dtype=shifted.dtype) * rows_per_table)[None, :, None]
        )  # (B, Ntab, Nfield)
        rows = maybe_sharded_packed_lookup(flat_tables, gids, self.embed_size)
        rows = self.perturb("lookup", rows)
        self.sow("lookup_ids", "ids", gids)
        _sow_presort_aux(self, aux)
        return rows


class ConcatInput(BaseInput):
    """Concatenate child inputs along the embedding dim → ``(B, 1, sum(E))``.

    Reference: ``concat_inputs.py:9-129`` (children must emit ``(B, 1, E_i)``
    or ``(B, N_i, E_i)`` — rows are flattened into the embedding axis).
    """

    inputs: Tuple[BaseInput, ...]

    @property
    def embed_size(self) -> int:
        return sum(len(m) for m in self.inputs)

    def __call__(self, batch: Batch, training: bool = False) -> jnp.ndarray:
        outs = []
        for m in self.inputs:
            o = m(batch, training=training)
            b = o.shape[0]
            outs.append(o.reshape(b, 1, -1))
        return jnp.concatenate(outs, axis=2)

    def __getitem__(self, idx):
        if isinstance(idx, str):
            for m in self.inputs:
                if idx in getattr(m, "fields", ()):  # by raw field name
                    return m
            raise KeyError(idx)
        return self.inputs[idx]


class StackedInput(BaseInput):
    """Stack child inputs along the field dim → ``(B, sum(N), E)``.

    Reference: ``stacked_inp.py:9-136``; all children must share ``E``.
    """

    inputs: Tuple[BaseInput, ...]

    @property
    def embed_size(self) -> int:
        sizes = {len(m) for m in self.inputs}
        if len(sizes) != 1:
            raise ValueError(f"StackedInput children disagree on embed size: {sizes}")
        return sizes.pop()

    def __call__(self, batch: Batch, training: bool = False) -> jnp.ndarray:
        outs = [m(batch, training=training) for m in self.inputs]
        return jnp.concatenate(outs, axis=1)

    def __getitem__(self, idx):
        if isinstance(idx, str):
            for m in self.inputs:
                if idx in getattr(m, "fields", ()):
                    return m
            raise KeyError(idx)
        return self.inputs[idx]
