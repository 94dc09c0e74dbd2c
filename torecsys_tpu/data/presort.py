"""Host-side id-stream preprocessing for the sparse embedding train path.

The device-side sparse update (``ops.sparse``) spends ~1 ms/step of
row-granular passes just PREPARING each batch's fused id stream — sorting it,
deriving segment boundaries, compacting unique stored-row ids (measured on
v5e at Criteo shapes: sort 0.37 ms, prefix-sum + compact-uids scatter
~0.4 ms, valid-count reduction ~0.05 ms — SPEED.md).  All of that work
depends only on the batch's INTEGER ids, which the host already holds before
dispatch — so it can run in the input pipeline, overlapped with device steps,
and arrive as extra batch arrays the jitted step trusts.

This module computes that aux on the host:

* :class:`PresortSpec` describes one embedding module's id stream (which
  batch fields feed which slots, per-slot offsets, pack factor, stored-row
  count) — built from the module tree by :func:`build_presort_specs` or from
  a single module by :func:`spec_for_module`.
* :class:`Presorter` maps a batch dict to the same dict plus
  ``__presort__<key>/{order,lo,seg,uids,n_unique}`` arrays.  The consuming
  embedding module recomputes the same key from its own schema
  (:meth:`PresortSpec.key` is a content hash), picks the arrays out of the
  batch, and sows them for ``ops.sparse.update_from_host_aux``.

The hot loop is C++ (``data/native/id_preprocess.cc``: LSD radix sort +
linear segment pass, ~0.5 ms per 106k-id batch, GIL released) with a
bit-identical NumPy fallback (~7 ms — numpy's argsort; fine off the hot
path, and the equivalence is tested).

Reference analogue: none — the reference feeds raw ids into ``nn.Embedding``
under a dense optimizer (``/root/reference/torecsys/inputs/base/
multi_indices_emb.py:103``); this preprocessing exists because the TPU-native
sparse path is issue-rate-bound on row-granular device passes (SPEED.md).
"""

from __future__ import annotations

import ctypes
import dataclasses
import hashlib
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

AUX_PREFIX = "__presort__"
AUX_NAMES = ("order", "lo", "seg", "uids", "n_unique")


@dataclasses.dataclass(frozen=True)
class PresortSpec:
    """Description of one embedding module's fused id stream.

    ``slot_fields[i]`` names the batch field feeding slot ``i`` of the
    flattened ``(B, K)`` id matrix; ``slot_offsets[i]`` is added to its raw
    ids (the fused-table offset trick).  ``pack`` and ``num_stored_rows``
    describe the packed stored layout the ids resolve against.
    """

    slot_fields: Tuple[str, ...]
    slot_offsets: Tuple[int, ...]
    pack: int
    num_stored_rows: int

    @property
    def key(self) -> str:
        """Content hash both producer (loader) and consumer (module) derive
        independently — identical schemas map to the same aux arrays."""
        ident = repr((self.slot_fields, self.slot_offsets, self.pack,
                      self.num_stored_rows)).encode()
        return hashlib.sha1(ident).hexdigest()[:12]

    def aux_key(self, name: str) -> str:
        return f"{AUX_PREFIX}{self.key}/{name}"


def spec_for_module(module) -> Optional[PresortSpec]:
    """The :class:`PresortSpec` of one input module, or None when the module
    has no host-presortable id stream."""
    from torecsys_tpu.inputs.embeddings import (
        MultiIndicesEmbedding,
        MultiIndicesFieldAwareEmbedding,
        SingleIndexEmbedding,
    )
    from torecsys_tpu.ops.embedding import field_offsets, packed_shape

    if isinstance(module, MultiIndicesEmbedding):
        total = int(sum(module.field_sizes))
        vp, w = packed_shape(total, module.embed_size)
        offs = field_offsets(module.field_sizes)
        return PresortSpec(
            slot_fields=tuple(module.fields),
            slot_offsets=tuple(int(o) for o in offs),
            pack=w // module.embed_size,
            num_stored_rows=vp,
        )
    if isinstance(module, MultiIndicesFieldAwareEmbedding):
        n = len(module.field_sizes)
        total = int(sum(module.field_sizes))
        vp, w = packed_shape(total, module.embed_size)
        pack = w // module.embed_size
        offs = field_offsets(module.field_sizes)
        rows_per_table = vp * pack
        # slot (i, j): field j looked up in field-aware table i — the flat
        # id is shifted[j] + i * rows_per_table (embeddings._sparse_lookup)
        slot_fields = tuple(
            module.fields[j] for i in range(n) for j in range(n)
        )
        slot_offsets = tuple(
            int(offs[j]) + i * rows_per_table
            for i in range(n) for j in range(n)
        )
        return PresortSpec(slot_fields, slot_offsets, pack, n * vp)
    if isinstance(module, SingleIndexEmbedding):
        return PresortSpec(
            slot_fields=tuple(module.fields),
            slot_offsets=(0,) * len(module.fields),
            pack=1,
            num_stored_rows=module.field_size,
        )
    return None


def iter_embedding_specs(module) -> Iterable[PresortSpec]:
    """Walk an inputs tree (Inputs wrapper / Concat / Stacked containers)
    yielding the spec of every presortable embedding module."""
    if module is None:
        return
    spec = spec_for_module(module)
    if spec is not None:
        yield spec
        return
    schema = getattr(module, "schema", None)
    if schema is not None:
        for child in schema.values():
            yield from iter_embedding_specs(child)
        return
    children = getattr(module, "inputs", None)
    if isinstance(children, (tuple, list)):
        for child in children:
            yield from iter_embedding_specs(child)


def build_presort_specs(inputs_module) -> List[PresortSpec]:
    """All distinct presort specs under an inputs tree (deduped by key)."""
    seen = {}
    for spec in iter_embedding_specs(inputs_module):
        seen.setdefault(spec.key, spec)
    return list(seen.values())


def _presort_numpy(flat: np.ndarray, pack: int, num_stored: int):
    """Pure-NumPy preprocessing, bit-identical to the C++ path (both produce
    a stable ascending-id order; equivalence is tested)."""
    m = flat.shape[0]
    order = np.argsort(flat, kind="stable").astype(np.int32)
    s = flat[order]
    hi = s // pack
    lo = (s - hi * pack).astype(np.int32)
    first = np.empty(m, dtype=bool)
    first[0] = True
    np.not_equal(hi[1:], hi[:-1], out=first[1:])
    seg = np.cumsum(first, dtype=np.int32) - 1
    n_unique = int(seg[-1]) + 1
    uids = np.full(m, num_stored, np.int32)
    uids[:n_unique] = hi[first]
    return order, lo, seg, uids, n_unique


class Presorter:
    """Batch-dict transform attaching the trusted-presort aux arrays.

    Stateless per batch; safe to call concurrently from prefetch worker
    threads (the C++ path releases the GIL for the whole hot loop).
    """

    def __init__(self, specs: Iterable[PresortSpec], force_numpy: bool = False):
        self.specs = list(specs)
        self._lib = None
        if not force_numpy:
            from torecsys_tpu.data.native import presort_lib

            self._lib = presort_lib()
        self._offs = {
            s.key: np.asarray(s.slot_offsets, dtype=np.int32) for s in self.specs
        }

    def enabled(self) -> bool:
        return bool(self.specs)

    def __call__(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        if not self.specs:
            return batch
        out = dict(batch)
        for spec in self.specs:
            if any(f not in batch for f in spec.slot_fields):
                continue  # e.g. an eval batch lacking this stream's fields
            cols = [np.asarray(batch[f]).reshape(-1) for f in spec.slot_fields]
            stacked = np.ascontiguousarray(
                np.stack(cols, axis=1), dtype=np.int32
            )  # (B, K) — C-order matches the device-side ids.reshape(-1)
            m = stacked.size
            k = stacked.shape[1]
            offs = self._offs[spec.key]
            if self._lib is not None:
                order = np.empty(m, np.int32)
                lo = np.empty(m, np.int32)
                seg = np.empty(m, np.int32)
                uids = np.empty(m, np.int32)
                p = ctypes.POINTER(ctypes.c_int32)
                n_unique = self._lib.trs_presort_ids(
                    stacked.ctypes.data_as(p), m, k, offs.ctypes.data_as(p),
                    spec.pack, spec.num_stored_rows,
                    order.ctypes.data_as(p), lo.ctypes.data_as(p),
                    seg.ctypes.data_as(p), uids.ctypes.data_as(p),
                )
                if n_unique < 0:
                    raise ValueError(
                        f"native presort rejected batch for spec {spec}"
                    )
            else:
                flat = (stacked + offs[None, :]).reshape(-1)
                order, lo, seg, uids, n_unique = _presort_numpy(
                    flat, spec.pack, spec.num_stored_rows
                )
            out[spec.aux_key("order")] = order
            out[spec.aux_key("lo")] = lo
            out[spec.aux_key("seg")] = seg
            out[spec.aux_key("uids")] = uids
            # (1,) not scalar: batch entries must be shardable (rank >= 1)
            out[spec.aux_key("n_unique")] = np.full((1,), n_unique, np.int32)
        return out


def strip_aux(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Remove presort aux entries (e.g. before a dense-mode step)."""
    return {k: v for k, v in batch.items() if not k.startswith(AUX_PREFIX)}


__all__ = [
    "AUX_NAMES", "AUX_PREFIX", "Presorter", "PresortSpec",
    "build_presort_specs", "iter_embedding_specs", "spec_for_module",
    "strip_aux",
]
